"""Fuzz parity: photometric cost vs the torch oracle across random scenes,
poses, affine params and padding capacities."""

import numpy as np
import jax.numpy as jnp
import pytest

from super_primitive_tpu.cost import photometric as ph
from super_primitive_tpu.keyframe import build_bundle_np, make_segment_geometry
from super_primitive_tpu.lie import se3

from test_photometric import make_scene, torch_oracle


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15])
def test_fuzz_parity(seed):
    r = np.random.default_rng(seed)
    scene = make_scene(seed, N=int(r.integers(2, 6)), H=int(r.integers(16, 40)),
                       W=int(r.integers(20, 48)))
    K, img_src, img_trg, regions, logdepth, keypoints, kp_logdepth, _ = scene
    pose = np.asarray(
        se3.exp(jnp.asarray(0.05 * r.normal(size=6).astype(np.float32)))
    )
    affine = None
    if r.random() > 0.5:
        affine = (
            r.normal(0, 0.1, 2).astype(np.float32),
            r.normal(0, 0.1, 2).astype(np.float32),
        )

    geo = make_segment_geometry(keypoints, regions, logdepth)
    cap = int(np.ceil(regions.sum() / 256) * 256) + int(r.integers(0, 3)) * 256
    bundle = build_bundle_np(regions, logdepth, capacity=cap)
    geo_dims = regions.shape[1:]
    src = ph.precompute_source(jnp.asarray(img_src), bundle, geo_dims)
    got = float(
        ph.photometric_cost(
            bundle, src, jnp.asarray(img_trg), jnp.asarray(K), geo_dims,
            jnp.asarray(kp_logdepth), geo.keypoint_base_logdepth(),
            jnp.asarray(pose),
            affine=None if affine is None else tuple(jnp.asarray(a) for a in affine),
        )
    )
    want = torch_oracle(
        img_src, img_trg, K, regions, logdepth, keypoints, kp_logdepth, pose,
        affine=affine,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
