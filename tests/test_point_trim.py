"""Point-axis trim equivalence: tracking/fused-step/supp-refinement results
must be identical when the padded point tail is statically sliced off.

The window point capacity carries 2x headroom (odometry.py init_keyframe);
bundles are front-compacted (keyframe.build_bundle_np) and every reduction
is validity-masked and num_valid-normalized, so any static trim
>= num_valid is numerically exact.  _point_trim exploits that to halve the
tracker's FLOPs; these tests pin the exactness claim.
"""

import numpy as np
import jax
import jax.numpy as jnp

from synthetic import smooth_texture

from super_primitive_tpu.odometry import window
from super_primitive_tpu.odometry.fused_step import fused_frame_step
from super_primitive_tpu.odometry.odometry import _slot_slices_jit


def _build_buffers(H=24, W=32, N_seg=6, seg_cap=16, supp_cap=2, win=3):
    """One keyframe in slot 0, point capacity 2x the image area."""
    rng = np.random.default_rng(7)
    point_cap = 2 * H * W
    buffers = window.empty_window(win, supp_cap, (H, W), 3, seg_cap, point_cap)

    # segments: horizontal bands covering ~70% of the image (n < H*W)
    regions = np.zeros((N_seg, H, W), bool)
    for s in range(N_seg):
        r0 = s * H // N_seg
        regions[s, r0 : r0 + max(1, H // N_seg - 1), 2 : W - 2] = True
    logdepth = np.log(2.0 + 0.1 * rng.standard_normal((N_seg, H, W))).astype(
        np.float32
    )

    from super_primitive_tpu.keyframe import build_bundle_np

    bundle = build_bundle_np(regions, logdepth, capacity=point_cap)
    n_valid = int(bundle.num_valid)
    assert n_valid < H * W < point_cap

    img = np.asarray(smooth_texture(H, W), np.float32)
    K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]], np.float32)
    kp_rc = np.stack(
        [np.full(N_seg, H // 2), np.linspace(3, W - 4, N_seg).astype(int)], -1
    )
    kp_logdepth = logdepth[np.arange(N_seg), kp_rc[:, 0], kp_rc[:, 1]]
    kp_base = kp_logdepth.copy()

    buffers = window.set_keyframe_slot(
        buffers, 0, img, K, np.eye(4, dtype=np.float32), kp_logdepth,
        np.zeros(2, np.float32), np.asarray(bundle.uv),
        np.asarray(bundle.seg_id), np.asarray(bundle.base_logdepth),
        np.asarray(bundle.valid), n_valid, kp_base,
    )
    return buffers, img, n_valid, H, W


def test_set_keyframe_slot_p_used_identical():
    """Uploading only p_used bundle rows (device zero-pad) must produce the
    exact same window buffers as the full-capacity upload."""
    buffers_full, _, n_valid, H, W = _build_buffers()
    rng = np.random.default_rng(7)
    N_seg = 6
    point_cap = 2 * H * W
    regions = np.zeros((N_seg, H, W), bool)
    for s in range(N_seg):
        r0 = s * H // N_seg
        regions[s, r0 : r0 + max(1, H // N_seg - 1), 2 : W - 2] = True
    logdepth = np.log(2.0 + 0.1 * rng.standard_normal((N_seg, H, W))).astype(
        np.float32
    )
    from super_primitive_tpu.keyframe import build_bundle_np

    bundle = build_bundle_np(regions, logdepth, capacity=point_cap)
    img = np.asarray(smooth_texture(H, W), np.float32)
    K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]], np.float32)
    kp_ld = np.zeros(N_seg, np.float32)
    common = (
        img, K, np.eye(4, dtype=np.float32), kp_ld, np.zeros(2, np.float32),
        np.asarray(bundle.uv), np.asarray(bundle.seg_id),
        np.asarray(bundle.base_logdepth), np.asarray(bundle.valid),
        int(bundle.num_valid), kp_ld.copy(),
    )
    base = window.empty_window(3, 2, (H, W), 3, 16, point_cap)
    full = window.set_keyframe_slot(base, 0, *common)
    cut = window.set_keyframe_slot(base, 0, *common, p_used=H * W)
    import jax.tree_util as jtu

    for (path, a), (_, b) in zip(
        jtu.tree_flatten_with_path(full)[0], jtu.tree_flatten_with_path(cut)[0]
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(path)
        )


def test_slot_slices_trim_equals_untrimmed_prefix():
    buffers, _, n_valid, H, W = _build_buffers()
    trim = H * W
    full = jax.device_get(_slot_slices_jit(buffers, jnp.asarray(0)))
    cut = jax.device_get(_slot_slices_jit(buffers, jnp.asarray(0), trim=trim))
    for k in ("uv", "seg_id", "base_logdepth", "point_valid"):
        np.testing.assert_array_equal(cut[k], full[k][:trim], err_msg=k)
        assert cut[k].shape[0] == trim
    for k in ("K", "kp_logdepth", "kp_base", "affine", "num_valid"):
        np.testing.assert_array_equal(cut[k], full[k], err_msg=k)


def test_fused_step_trim_exact():
    buffers, img, n_valid, H, W = _build_buffers()
    rng = np.random.default_rng(3)
    trg = np.clip(
        img + 0.01 * rng.standard_normal(img.shape).astype(np.float32), 0, 1
    )
    kwargs = dict(
        geo_dims=(H, W), levels=(0, 1), pyramid_min=0, pyramid_max=2,
        max_iters=4, use_affine=False, do_supp=True, supp_max_iters=2,
    )
    args = (
        buffers, jnp.asarray(0), jnp.asarray(trg),
        jnp.asarray(np.eye(4, dtype=np.float32)), jnp.zeros(2),
        jnp.asarray(trg), jnp.asarray(np.eye(4, dtype=np.float32)),
        jnp.zeros(2), jnp.asarray(True),
        jnp.asarray(np.array([0, 1], np.int32)),
        jnp.asarray(np.array([True, False])),
    )
    _, packed_full, ld_full = fused_frame_step(*args, **kwargs)
    _, packed_trim, ld_trim = fused_frame_step(
        *args, point_trim=H * W, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(packed_trim), np.asarray(packed_full), rtol=0, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(ld_trim), np.asarray(ld_full), rtol=0, atol=2e-6
    )


def test_point_trim_ladder():
    """_point_trim picks the smallest ladder cap >= num_valid, never >= cap."""
    from super_primitive_tpu.odometry.odometry import Odometry

    class _Stub(Odometry):
        def __init__(self):  # bypass full construction
            pass

    o = _Stub()
    Hg, Wg = 240, 320
    o.point_cap = 2 * Hg * Wg
    o.host_kfs = [type("KF", (), {"logdepth_perseg": np.zeros((1, Hg, Wg))})()]
    o._nvalid_latest = 70_000
    assert o._point_trim() == int(np.ceil(Hg * Wg / 1024) * 1024)
    o._nvalid_latest = 100_000
    assert o._point_trim() == int(np.ceil(1.5 * Hg * Wg / 1024) * 1024)
    o._nvalid_latest = 140_000
    assert o._point_trim() is None  # full capacity
    o._nvalid_latest = None
    assert o._point_trim() is None
