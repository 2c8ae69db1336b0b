"""Fixed-capacity keyframe window buffers.

The reference keeps Python lists of keyframes/poses/logdepths/affines plus
per-KF supporting-frame lists (odometery.py:1223-1390).  For XLA we mirror
that state into fixed-capacity stacked device arrays (SURVEY §7.3.5):

  - ``W`` keyframe slots (window_size), each with an image, intrinsics, a
    point bundle (shared capacity P), per-segment scalars (capacity N);
  - ``S`` supporting slots per keyframe (supp frames are image+pose only);
  - validity masks instead of list lengths.

Host-side bookkeeping (which slot is which timestamp, eviction) stays in
plain Python — it runs once per keyframe; the stacked buffers feed the
jitted mapping scan.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class WindowBuffers(struct.PyTreeNode):
    """Stacked device state for up to W keyframes with S supp slots each."""

    # keyframes
    images: jax.Array          # (W, H, Wd, C)
    K: jax.Array               # (W, 3, 3) geometry intrinsics
    poses: jax.Array           # (W, 4, 4) world-from-camera
    kp_logdepth: jax.Array     # (W, N)
    affine: jax.Array          # (W, 2)
    kf_valid: jax.Array        # (W,) bool

    # bundles (per keyframe)
    uv: jax.Array              # (W, P, 2)
    seg_id: jax.Array          # (W, P)
    base_logdepth: jax.Array   # (W, P)
    point_valid: jax.Array     # (W, P) bool
    num_valid: jax.Array       # (W,)
    kp_base: jax.Array         # (W, N)

    # supporting frames
    supp_images: jax.Array     # (W, S, H, Wd, C)
    supp_poses: jax.Array      # (W, S, 4, 4)
    supp_affine: jax.Array     # (W, S, 2)
    supp_valid: jax.Array      # (W, S) bool

    @property
    def capacity(self) -> int:
        return self.images.shape[0]

    @property
    def supp_capacity(self) -> int:
        return self.supp_images.shape[1]

    # --- unified pools: W keyframe entries followed by W*S flattened supp
    # slots; index convention shared by mapper.build_slots/build_masks ---
    def image_pool(self) -> jax.Array:
        W, S = self.capacity, self.supp_capacity
        return jnp.concatenate(
            [self.images, self.supp_images.reshape((W * S,) + self.images.shape[1:])],
            axis=0,
        )

    def pose_pool(self) -> jax.Array:
        W, S = self.capacity, self.supp_capacity
        return jnp.concatenate(
            [self.poses, self.supp_poses.reshape(W * S, 4, 4)], axis=0
        )

    def affine_pool(self) -> jax.Array:
        W, S = self.capacity, self.supp_capacity
        return jnp.concatenate(
            [self.affine, self.supp_affine.reshape(W * S, 2)], axis=0
        )

    def bundle_at(self, i, trim: Optional[int] = None):
        """Slot ``i``'s point bundle; ``trim`` (static int) slices the point
        axis to the first ``trim`` rows.  Bundles are front-compacted
        (build_bundle_np), and every consumer reduces with the validity mask
        and normalizes by ``num_valid``, so trimming any cap >= num_valid is
        numerically exact — it just skips the padded-point FLOPs (the window
        point capacity is sized 2x for headroom, so tracking at full cap
        paid ~2x the valid-point work)."""
        from ..keyframe import PointBundle

        sl = slice(None) if trim is None else slice(0, trim)
        return PointBundle(
            uv=self.uv[i, sl], seg_id=self.seg_id[i, sl],
            base_logdepth=self.base_logdepth[i, sl],
            valid=self.point_valid[i, sl], num_valid=self.num_valid[i],
        )

    def source_samples(self, geo_dims):
        """Per-KF source-image samples at bundle pixels (vmapped)."""
        from ..cost import photometric as ph
        from ..keyframe import PointBundle

        return jax.vmap(
            lambda img, uv, v, nv: ph.precompute_source(
                img,
                PointBundle(
                    uv=uv, seg_id=jnp.zeros(uv.shape[0], jnp.int32),
                    base_logdepth=jnp.zeros(uv.shape[0]), valid=v, num_valid=nv,
                ),
                geo_dims,
            )
        )(self.images, self.uv, self.point_valid, self.num_valid)


@dataclasses.dataclass
class HostKeyFrame:
    """Host-side per-keyframe record (the reference's pickled dict,
    odometery/utils.py:5-26, plus the geometry maps needed for re-init)."""

    timestamp: str
    image: np.ndarray                  # (H, W, C) float32
    K: np.ndarray
    regions: np.ndarray                # (N_i, H, W) bool (actual count)
    logdepth_perseg: np.ndarray        # (N_i, H, W)
    keypoints_rc: np.ndarray           # (N_i, 2) int pixel (row, col)
    pose: np.ndarray                   # (4, 4)
    kp_logdepth: np.ndarray            # (N_i,)
    affine: np.ndarray                 # (2,)


def empty_window(
    window_size: int,
    supp_cap: int,
    img_hw: tuple[int, int],
    channels: int,
    seg_cap: int,
    point_cap: int,
) -> WindowBuffers:
    H, Wd = img_hw
    W, S, N, P = window_size, supp_cap, seg_cap, point_cap
    eye = jnp.tile(jnp.eye(4), (W, 1, 1))
    return WindowBuffers(
        images=jnp.zeros((W, H, Wd, channels)),
        K=jnp.tile(jnp.eye(3), (W, 1, 1)),
        poses=eye,
        kp_logdepth=jnp.zeros((W, N)),
        affine=jnp.zeros((W, 2)),
        kf_valid=jnp.zeros((W,), bool),
        uv=jnp.zeros((W, P, 2)),
        seg_id=jnp.zeros((W, P), jnp.int32),
        base_logdepth=jnp.zeros((W, P)),
        point_valid=jnp.zeros((W, P), bool),
        num_valid=jnp.zeros((W,), jnp.int32),
        kp_base=jnp.zeros((W, N)),
        supp_images=jnp.zeros((W, S, H, Wd, channels)),
        supp_poses=jnp.tile(jnp.eye(4), (W, S, 1, 1)),
        supp_affine=jnp.zeros((W, S, 2)),
        supp_valid=jnp.zeros((W, S), bool),
    )


@functools.partial(jax.jit, static_argnames=("p_used",))
def _set_kf_slot_packed(buffers, slot, buf, p_used=None):
    """ONE fused dispatch for the 13 per-field slot writes, fed by ONE
    packed f32 upload — eager ``.at[].set`` chains cost one relay
    round-trip per field, and 13 separate host->device ``jnp.asarray``
    transfers cost ~one RTT each under the relay (~300 ms/keyframe
    measured; the packed upload is ~1 RTT + bytes).

    Packing in f32 is exact for every field: pixel coords / segment ids /
    counts are integers far below 2**24, validity is 0/1, the rest is f32
    already."""
    H, Wd, C = buffers.images.shape[1:]
    N = buffers.kp_logdepth.shape[1]
    P = buffers.uv.shape[1]
    p = P if p_used is None else int(p_used)
    sizes = (H * Wd * C, 9, 16, N, 2, N, p * 2, p, p, p, 1)
    offs = np.concatenate([[0], np.cumsum(sizes)])

    def take(k):
        return buf[int(offs[k]) : int(offs[k + 1])]

    def pad_p(x):
        # bundle rows beyond p are zeros by construction (front-compacted
        # bundles) — pad on device instead of shipping the zero tail
        if p == P:
            return x
        return jnp.zeros((P,) + x.shape[1:], x.dtype).at[:p].set(x)

    image = take(0).reshape(H, Wd, C).astype(buffers.images.dtype)
    K = take(1).reshape(3, 3)
    pose = take(2).reshape(4, 4)
    kp_ld = take(3)
    affine = take(4)
    kp_b = take(5)
    bundle_uv = pad_p(take(6).reshape(p, 2).astype(buffers.uv.dtype))
    bundle_seg = pad_p(take(7).astype(jnp.int32))
    bundle_base = pad_p(take(8).astype(buffers.base_logdepth.dtype))
    bundle_valid = pad_p(take(9) > 0.5)
    bundle_n = take(10)[0].astype(jnp.int32)
    return buffers.replace(
        images=buffers.images.at[slot].set(image),
        K=buffers.K.at[slot].set(K),
        poses=buffers.poses.at[slot].set(pose),
        kp_logdepth=buffers.kp_logdepth.at[slot].set(kp_ld),
        affine=buffers.affine.at[slot].set(affine),
        kf_valid=buffers.kf_valid.at[slot].set(True),
        uv=buffers.uv.at[slot].set(bundle_uv),
        seg_id=buffers.seg_id.at[slot].set(bundle_seg),
        base_logdepth=buffers.base_logdepth.at[slot].set(bundle_base),
        point_valid=buffers.point_valid.at[slot].set(bundle_valid),
        num_valid=buffers.num_valid.at[slot].set(bundle_n),
        kp_base=buffers.kp_base.at[slot].set(kp_b),
        supp_valid=buffers.supp_valid.at[slot].set(
            jnp.zeros_like(buffers.supp_valid[slot])
        ),
    )


def set_keyframe_slot(
    buffers: WindowBuffers,
    slot: int,
    image: np.ndarray,
    K: np.ndarray,
    pose: np.ndarray,
    kp_logdepth: np.ndarray,
    affine: np.ndarray,
    bundle_uv: np.ndarray,
    bundle_seg: np.ndarray,
    bundle_base: np.ndarray,
    bundle_valid: np.ndarray,
    bundle_n: int,
    kp_base: np.ndarray,
    p_used: Optional[int] = None,
    timer=None,
) -> WindowBuffers:
    """Write one keyframe into a slot (host->device, per-KF cadence).

    Per-segment arrays are padded to the window's segment capacity.
    ``p_used`` (static, >= bundle_n, <= P) uploads only that many bundle
    rows — the zero tail is padded on device, halving the packed transfer
    at the usual 2x point-capacity headroom.
    """
    N = buffers.kp_logdepth.shape[1]
    n = kp_logdepth.shape[0]
    if n > N:
        raise ValueError(f"segment cap {N} < {n}")
    kp_ld = np.zeros(N, np.float32)
    kp_ld[:n] = kp_logdepth
    kp_b = np.zeros(N, np.float32)
    kp_b[:n] = kp_base

    P = buffers.uv.shape[1]
    if bundle_uv.shape[0] != P:
        raise ValueError(f"bundle capacity {bundle_uv.shape[0]} != window {P}")
    p = P if p_used is None else min(int(p_used), P)
    if p < int(bundle_n):
        raise ValueError(f"p_used {p} < bundle_n {bundle_n}")
    import contextlib

    def _stage(name):
        return timer.stage(name) if timer is not None else contextlib.nullcontext()

    with _stage("slot_pack"):
        buf = np.concatenate([
            np.asarray(image, np.float32).ravel(),
            np.asarray(K, np.float32).ravel(),
            np.asarray(pose, np.float32).ravel(),
            kp_ld, np.asarray(affine, np.float32), kp_b,
            np.asarray(bundle_uv[:p], np.float32).ravel(),
            np.asarray(bundle_seg[:p], np.float32),
            np.asarray(bundle_base[:p], np.float32),
            np.asarray(bundle_valid[:p], np.float32),
            np.asarray([bundle_n], np.float32),
        ])
    with _stage("slot_upload"):
        buf_dev = jnp.asarray(buf)
    with _stage("slot_dispatch"):
        return _set_kf_slot_packed(
            buffers, jnp.asarray(slot), buf_dev,
            p_used=None if p == P else p,
        )


@jax.jit
def _roll_window(buffers):
    def shift(x):
        return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)

    rolled = jax.tree.map(shift, buffers)
    return rolled.replace(kf_valid=rolled.kf_valid.at[-1].set(False))


def roll_window(buffers: WindowBuffers) -> WindowBuffers:
    """Evict slot 0 (the reference's pop_kf(0), odometery.py:184-194):
    shift all slots left; the last slot becomes invalid/free."""
    return _roll_window(buffers)


@jax.jit
def _set_supp_slot(buffers, kf_slot, supp_slot, image, pose, affine):
    return buffers.replace(
        supp_images=buffers.supp_images.at[kf_slot, supp_slot].set(image),
        supp_poses=buffers.supp_poses.at[kf_slot, supp_slot].set(pose),
        supp_affine=buffers.supp_affine.at[kf_slot, supp_slot].set(affine),
        supp_valid=buffers.supp_valid.at[kf_slot, supp_slot].set(True),
    )


def set_supporting_slot(
    buffers: WindowBuffers,
    kf_slot: int,
    supp_slot: int,
    image: np.ndarray,
    pose: np.ndarray,
    affine: np.ndarray,
) -> WindowBuffers:
    return _set_supp_slot(
        buffers, jnp.asarray(kf_slot), jnp.asarray(supp_slot),
        jnp.asarray(image, buffers.supp_images.dtype),
        jnp.asarray(pose, jnp.float32), jnp.asarray(affine, jnp.float32),
    )


@jax.jit
def _clear_supp_all(buffers):
    return buffers.replace(supp_valid=jnp.zeros_like(buffers.supp_valid))


@jax.jit
def _clear_supp_one(buffers, kf_slot):
    return buffers.replace(
        supp_valid=buffers.supp_valid.at[kf_slot].set(
            jnp.zeros_like(buffers.supp_valid[kf_slot])
        )
    )


def clear_supporting(buffers: WindowBuffers, kf_slot: Optional[int] = None) -> WindowBuffers:
    if kf_slot is None:
        return _clear_supp_all(buffers)
    return _clear_supp_one(buffers, jnp.asarray(kf_slot))
