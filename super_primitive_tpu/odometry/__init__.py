"""Monocular VO: tracking, windowed mapping, KF policy, persistence."""

from . import depth_init, io, kf_criteria, mapper, odometry, tracker, window

__all__ = [
    "depth_init", "io", "kf_criteria", "mapper", "odometry", "tracker", "window",
]
