#!/usr/bin/env python
"""Convert a saved trajectory to TUM format for external evo evaluation.

Reference: convert_traj_to_tum.py — reads the run's final KF trajectory,
maps frame ids to dataset timestamps, writes predicted + GT TUM-format files.

python convert_traj_to_tum.py --run ./results/desk/ --config config/tum/odom_desk.yaml
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="run directory (save_path)")
    ap.add_argument("--config", required=True)
    ap.add_argument("--tag", default="final")
    args = ap.parse_args()

    from super_primitive_tpu.config import load_config
    from super_primitive_tpu.data import load_dataset
    from super_primitive_tpu.odometry.io import (
        export_tum_trajectory,
        load_trajectory,
    )

    config = load_config(args.config)
    dataset = load_dataset({"dataset": {
        "type": config.dataset.type, "path": config.dataset.path,
        "traj_file": config.dataset.traj_file,
        "intrinsics": config.dataset.intrinsics,
    }})

    traj = load_trajectory(os.path.join(args.run, "traj", f"kf_traj_{args.tag}.json"))
    timestamps = {fid: float(dataset[int(fid)]["timestamp"]) for fid in traj}
    out_pred = export_tum_trajectory(
        traj, timestamps, os.path.join(args.run, "converted_tum_traj.txt")
    )
    gt = {fid: dataset[int(fid)]["T"] for fid in traj
          if dataset[int(fid)].get("T") is not None}
    out_gt = None
    if gt:
        out_gt = export_tum_trajectory(
            gt, timestamps, os.path.join(args.run, "converted_gt_tum_traj.txt")
        )
    print(f"wrote {out_pred}" + (f" and {out_gt}" if out_gt else ""))
    print("evaluate: evo_ape tum converted_gt_tum_traj.txt converted_tum_traj.txt -as")


if __name__ == "__main__":
    main()
