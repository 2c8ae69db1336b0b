"""One-command day-0 rehearsal (VERDICT r2 #9): the download.sh post-fetch
pipeline — synthetic .pth checkpoints in the published naming -> convert ->
validate -> converted npz through the real nets -> run_sfm --odom over a
HuggingFace-layout TUM tree -> Sim(3) ATE — must pass offline, so the first
networked minute produces fr1/VOID tables instead of debugging plumbing."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_day0_rehearsal(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "day0_rehearsal.py"),
         "--dir", str(tmp_path / "day0")],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])
    assert "day0_rehearsal OK" in proc.stdout
    out = proc.stdout.split("ATE RMSE")[1]
    rmse = float(out.split(":")[1].split("m")[0])
    assert rmse < 0.05
