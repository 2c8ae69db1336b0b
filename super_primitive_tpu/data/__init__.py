"""Dataset registry (reference: data/__init__.py:5-18)."""

from __future__ import annotations

from .replica import ReplicaDataset
from .tum import TUMDataset, TUMUndistortDataset
from .void import VoidDataset


def load_dataset(config: dict):
    """Instantiate a dataset from a (reference-compatible) config dict."""
    ds = config["dataset"]
    kind = ds["type"]
    if kind == "replica":
        return ReplicaDataset(
            ds["path"], ds.get("normals_path"), intrinsics=ds.get("intrinsics")
        )
    if kind == "tum":
        return TUMDataset(
            ds["path"], traj_file=ds.get("traj_file"),
            intrinsics=ds.get("intrinsics"),
        )
    if kind == "tum_undistort":
        return TUMUndistortDataset(ds["path"], traj_file=ds.get("traj_file"))
    if kind == "void":
        return VoidDataset(ds["path"])
    raise ValueError(f"unknown dataset type: {kind!r}")
