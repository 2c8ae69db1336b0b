"""SuperPrimitive-TPU: a TPU-native (JAX/XLA/Pallas) monocular SfM / visual
odometry / depth-completion framework.

Re-designed from scratch for TPU with the capabilities of the reference
SuperPrimitive system (CVPR 2024): scene = image segments with frozen
pre-integrated log-depth and one free scalar log-depth DoF per segment,
optimized jointly with SE(3) poses against a dense photometric residual
over a Gaussian pyramid.

Design principles (TPU-first, not a port):
  - fixed shapes everywhere: segments flattened into fixed-capacity point
    bundles with validity masks (no ragged ``torch.where`` gathers);
  - whole optimization loops jitted as ``lax.scan`` so per-keyframe
    optimization never leaves the device;
  - pure-JAX Lie groups (replaces the reference's lietorch CUDA extension);
  - matrix-free batched CG for bilateral normal integration (replaces the
    reference's CuPy submodule);
  - single process: host<->device transfers at the edges only.
"""

__version__ = "0.1.0"
