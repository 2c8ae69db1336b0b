"""Typed configuration with strict validation + reference-YAML compatibility.

The reference loads raw YAML dicts with no schema and scatters
``if 'key' in config`` defaults across the code (SURVEY §5.6; e.g.
odometery.py:100-119,218-235,986-998) — typos fail silently (the dead
``loop_closure`` block in config/tum/odom_360.yaml proves it).  Here every
knob is a dataclass field with the reference's default; unknown keys raise.

``load_config`` accepts both our canonical spelling and the reference's
(including the ``aligment`` typo), so the 10 shipped reference YAMLs load
unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml


@dataclass
class DatasetConfig:
    type: str = "replica"
    path: str = ""
    traj_file: Optional[str] = None
    normals_path: Optional[str] = None
    source_id: int = 0            # two-frame SfM source (replica_sfm_example)
    target_id: int = 0
    start_id: int = 0
    intrinsics: Optional[tuple] = None  # (fx, fy, cx, cy) override —
                                        # extension: the reference hardcodes
                                        # per-dataset intrinsics


@dataclass
class DepthDiscParams:
    filter_size: int = 3
    depth_threshold: float = 0.1
    area_keep_ratio: float = 1e-3


@dataclass
class NormalsConfig:
    integrator: str = "tiled"
    integration_shape: tuple = (240, 320)
    network_dim: tuple = (480, 640)


@dataclass
class FrontendConfig:
    downsample_pow: int = 1
    normals_scannet: bool = True
    sam_path: str = "./models/sam_vit_h_4b8939.pth"
    normals_path: str = "./models/scannet.pth"
    num_pts: int = 300
    num_pts_active: int = 100
    include_normals: bool = False
    normals: NormalsConfig = field(default_factory=NormalsConfig)
    cg_max_iter: int = 1000
    cg_tol: float = 1e-3
    check_for_depth_disc: bool = True
    depth_disc_params: DepthDiscParams = field(default_factory=DepthDiscParams)


@dataclass
class SamParams:
    infer_resolution: tuple = (960, 1280)
    select_smallest: bool = True
    nms: bool = True
    box_nms_thresh: float = 0.8
    iou_threshold: float = 0.0
    stability_threshold: float = 0.90
    filter_edge_points: bool = True
    cut_masks_by_edges: bool = False
    edge_probs_threshold: float = 0.1
    filter_by_box_size: bool = False


@dataclass
class CostParams:
    normal_loss: str = "leclerc"
    normal_weight: float = 0.0
    depth_median_weight: float = 0.0
    mode: str = "colour"


@dataclass
class MappingConfig:
    supp_every_n: int = 3
    init_steps: int = 1000
    steps: int = 500
    continual_steps: int = 10
    solver: str = "adam"       # 'adam' (reference parity) | 'gn' (LM +
                               # Schur performance path, solve/gn_mapping.py)
    gn_max_iters: int = 30
    # >1: GN linearizes on every k-th bundle point (gather rows / k — the
    # latency wall of the solve); 1 = exact reference objective.  Accuracy
    # at stride 2/4 measured in tests/test_mapping.py + docs/EVAL_SYNTHETIC.md
    gn_point_stride: int = 1


@dataclass
class TrackConfig:
    lr: float = 5e-3
    pyramid_min: int = 0
    pyramid_max: int = 3
    steps: tuple = (0, 0, 300)
    solver: str = "adam"       # 'adam' (reference parity) | 'gn' (LM
                               # performance path, solve/gauss_newton.py)
    # 30: at 15 iters GN tracking lags Adam-300's per-frame ATE 1.8x on the
    # full-pipeline rendered benchmark; at 30 it matches (ratio 1.07) while
    # still ~11x cheaper than the Adam schedule (examples/e2e_planes.py
    # --solver both, round-3 chip runs)
    gn_max_iters: int = 30


@dataclass
class AlignmentConfig:
    opt_supporting: bool = False
    cost_params: CostParams = field(default_factory=CostParams)
    median_loss_weight: float = 0.0
    mapping: MappingConfig = field(default_factory=MappingConfig)
    mono_init: bool = True
    affine_compensation: bool = False
    pyramid_min: int = 0
    pyramid_max: int = 4
    track: TrackConfig = field(default_factory=TrackConfig)
    init_frames: int = 7
    supp_every_n: Optional[int] = None  # dead duplicate present in
                                        # odom_360.yaml:56; code reads only
                                        # mapping.supp_every_n (odometery.py:1333)


@dataclass
class KfConfig:
    depth_validity_ratio: float = 0.60
    translation_thresh: float = 0.2
    rotation_thresh: Optional[float] = None  # read but unused in reference
                                             # (odometery.py:996-1016)


@dataclass
class VisConfig:
    pts_show_every: int = 1
    mono_align: bool = False


@dataclass
class RestoreConfig:
    path: str = ""
    frame_id: int = 0


@dataclass
class Config:
    save_path: str = "./results/run/"
    save_every: int = -1
    dump_kfs: bool = False
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    sam_params: SamParams = field(default_factory=SamParams)
    alignment: AlignmentConfig = field(default_factory=AlignmentConfig)
    kf: KfConfig = field(default_factory=KfConfig)
    vis: VisConfig = field(default_factory=VisConfig)
    window_size: int = 5
    paused: bool = False
    restore: Optional[RestoreConfig] = None
    seed: int = 42


# reference-key -> canonical-key renames (including the typo'd ones)
_RENAMES = {
    "aligment": "alignment",
    "affine_compensation": "affine_compensation",
}

# keys that exist in reference YAMLs but are dead in the reference code;
# accepted and ignored, with a warning list returned to the caller
_DEAD_KEYS = {"loop_closure"}


def _build(cls, data: dict, path: str, warnings: list):
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in data.items():
        key = _RENAMES.get(key, key)
        if key in _DEAD_KEYS:
            warnings.append(f"{path}{key}: dead reference key, ignored")
            continue
        if key not in fields:
            raise KeyError(f"unknown config key {path}{key!r}")
        f = fields[key]
        ftype = f.type if isinstance(f.type, type) else None
        target = _DATACLASS_FIELDS.get((cls, key))
        if target is not None and isinstance(value, dict):
            kwargs[key] = _build(target, value, f"{path}{key}.", warnings)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


_DATACLASS_FIELDS = {
    (Config, "dataset"): DatasetConfig,
    (Config, "frontend"): FrontendConfig,
    (Config, "sam_params"): SamParams,
    (Config, "alignment"): AlignmentConfig,
    (Config, "kf"): KfConfig,
    (Config, "vis"): VisConfig,
    (Config, "restore"): RestoreConfig,
    (FrontendConfig, "normals"): NormalsConfig,
    (FrontendConfig, "depth_disc_params"): DepthDiscParams,
    (AlignmentConfig, "cost_params"): CostParams,
    (AlignmentConfig, "mapping"): MappingConfig,
    (AlignmentConfig, "track"): TrackConfig,
}


def load_config(path_or_dict) -> Config:
    """Load a config from a YAML path or a dict, strictly validated."""
    if isinstance(path_or_dict, (str,)):
        with open(path_or_dict) as f:
            data = yaml.safe_load(f)
    else:
        data = dict(path_or_dict)
    warnings: list[str] = []
    cfg = _build(Config, data, "", warnings)
    for w in warnings:
        print(f"[config] {w}")
    return cfg


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)
