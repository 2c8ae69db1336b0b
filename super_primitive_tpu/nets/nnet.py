"""Surface-normal (+kappa) network NNET in Flax.

Reference: frontend/normals/scannet_model.py — EfficientNet-B5 encoder with
feature taps + coarse-to-fine decoder emitting (nx, ny, nz, kappa) at
1/8 -> 1/4 -> 1/2 -> 1/1 of the *decoder* resolution (which is 1/1 = half of
input; out_res1 is at 1/2 input res), each refined by pointwise MLPs on
upsampled features, with ELU-kappa normalization (:44-50).

At inference the reference runs the full-pixel path (its train-time
uncertainty-guided sampling never executes at eval), so only the dense
branch is implemented.

Channels-last; bilinear resizes use align_corners=True semantics to match
``F.interpolate(..., align_corners=True)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .efficientnet import EfficientNetFeatures

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _ac_interp_matrix(n_in: int, n_out: int) -> jax.Array:
    """(n_out, n_in) align_corners=True bilinear interpolation matrix."""
    ys = jnp.linspace(0.0, n_in - 1.0, n_out)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, n_in - 1)
    y1 = jnp.clip(y0 + 1, 0, n_in - 1)
    wy = ys - y0
    rows = jnp.arange(n_out)
    return (
        jnp.zeros((n_out, n_in))
        .at[rows, y0].add(1.0 - wy)
        .at[rows, y1].add(wy)
    )


def resize_bilinear_ac(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True on (B, H, W, C).

    Implemented as two interpolation-matrix contractions: separable resizes
    ride the MXU, whereas the gather form lowers to TPU gather ops that run
    orders of magnitude slower at feature-map scale."""
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    hi = jax.lax.Precision.HIGHEST
    Ay = _ac_interp_matrix(H, Ho).astype(x.dtype)
    Ax = _ac_interp_matrix(W, Wo).astype(x.dtype)
    t = jnp.einsum("oh,bhwc->bowc", Ay, x, precision=hi)
    return jnp.einsum("pw,bowc->bopc", Ax, t, precision=hi)


def norm_normalize(out: jax.Array) -> jax.Array:
    """(nx, ny, nz, kappa) channels-last: unit-normalize the normal, kappa =
    elu(k) + 1 + 0.01 (scannet_model.py:44-50)."""
    n = out[..., :3]
    kappa = out[..., 3:]
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([n / norm, kappa], axis=-1)


class UpSampleBN(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, skip):
        up = resize_bilinear_ac(x, skip.shape[1:3])
        h = jnp.concatenate([up, skip], axis=-1)
        for i in range(2):
            h = nn.Conv(self.out_ch, (3, 3), padding=1, name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=True, name=f"bn{i}")(h)
            h = nn.leaky_relu(h, 0.01)
        return h


class RefineMLP(nn.Module):
    """Pointwise refinement head (the reference's 1x1 Conv1d stacks)."""

    @nn.compact
    def __call__(self, h):
        for i, ch in enumerate((128, 128, 128)):
            h = nn.Conv(ch, (1, 1), name=f"conv{i}")(h)
            h = nn.relu(h)
        return nn.Conv(4, (1, 1), name="conv3")(h)


class NNET(nn.Module):
    """Full normal network; input (B, H, W, 3) ImageNet-normalized RGB;
    output (B, H, W, 4) = (normal, kappa) at full input resolution
    (out_res1, scannet_model.py:131-139)."""

    @nn.compact
    def __call__(self, x, taps=None):
        if taps is None:
            stages, head = EfficientNetFeatures(name="encoder")(x)
            # taps: stage0=24ch(1/2), stage1=40ch(1/4), stage2=64ch(1/8),
            # stage4=176ch(1/16), head=2048ch(1/32, pre-bn2 conv_head)
            b0, b1, b2, b3, b4 = stages[0], stages[1], stages[2], stages[4], head
        else:
            # decoder-only path: inject encoder taps directly.  Used by the
            # offline cross-check against the reference's vendored torch
            # decoder (scannet_model.py:53-139), the only real-architecture
            # oracle available without the geffnet/segment_anything packages.
            b0, b1, b2, b3, b4 = taps

        x_d0 = nn.Conv(2048, (1, 1), name="conv2")(b4)
        x_d1 = UpSampleBN(1024, name="up1")(x_d0, b3)
        x_d2 = UpSampleBN(512, name="up2")(x_d1, b2)
        x_d3 = UpSampleBN(256, name="up3")(x_d2, b1)
        x_d4 = UpSampleBN(128, name="up4")(x_d3, b0)

        out8 = nn.Conv(4, (3, 3), padding=1, name="out_conv_res8")(x_d2)
        out8 = norm_normalize(out8)

        def up2x(t):
            B, H, W, C = t.shape
            return resize_bilinear_ac(t, (2 * H, 2 * W))

        feat = jnp.concatenate([up2x(x_d2), up2x(out8)], axis=-1)
        out4 = norm_normalize(RefineMLP(name="out_conv_res4")(feat))

        feat = jnp.concatenate([up2x(x_d3), up2x(out4)], axis=-1)
        out2 = norm_normalize(RefineMLP(name="out_conv_res2")(feat))

        feat = jnp.concatenate([up2x(x_d4), up2x(out2)], axis=-1)
        out1 = norm_normalize(RefineMLP(name="out_conv_res1")(feat))
        return out1


def preprocess(image_hwc01: jax.Array, network_dim: tuple[int, int]) -> jax.Array:
    """ImageNet normalization + resize to the network input size
    (frontend/normals/normals_inferer.py:10-33)."""
    img = resize_bilinear_ac(image_hwc01[None], network_dim)[0]
    return (img - IMAGENET_MEAN) / IMAGENET_STD


import functools


@functools.partial(
    jax.jit,
    static_argnames=("network_dim", "out_hw", "compute_dtype", "coarse_hw"),
)
def _predict_normals_jit(params, image_hwc01, network_dim, out_hw,
                         compute_dtype, coarse_hw=None):
    if image_hwc01.dtype == jnp.uint8:
        # uint8 upload path: the host->device transfer is 4x smaller than
        # float32 (the full-res image is ~14.7 MB fp32 — ~230 ms on the
        # relay, serialized in FRONT of the whole frontend device chain);
        # uint8->f32 cast + /255 matches the host's
        # image.astype(np.float32)/255.0 up to one f32 rounding (XLA
        # lowers the division as a reciprocal multiply in the fusion)
        image_hwc01 = image_hwc01.astype(jnp.float32) / 255.0
    x = preprocess(image_hwc01, network_dim)[None]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    out = NNET().apply(params, x).astype(jnp.float32)
    out = resize_bilinear_ac(out, out_hw)[0]
    if coarse_hw is not None:
        # device-side nearest subsample to the integration shape: the host
        # pipeline NN-resizes the full-res normals anyway (reference
        # process_frame.py:137-142), so ship the 0.9 MB coarse field
        # instead of the ~20 MB full-res one.  Index map src = dst*Hi//Ho
        # (torch 'nearest'); identical to the cv2 path for the integer
        # ratios of the reference config (960/240, 1280/320).
        Hc, Wc = coarse_hw
        H, W = out.shape[:2]
        ri = (jnp.arange(Hc) * H) // Hc
        ci = (jnp.arange(Wc) * W) // Wc
        out = out[ri[:, None], ci[None, :]]
    return out[..., :3], out[..., 3:]


# small strong-ref cache: casting inside the jit would re-read the full
# fp32 tree from HBM on every call and keep both copies resident (the
# SamPredictor pre-casts for the same reason).  Keyed per (id(params),
# dtype) so alternating between a few param trees doesn't thrash a
# re-cast of the full tree each call; the stored strong reference to
# ``params`` keeps id() from being recycled.  Capped FIFO so dropped
# models' fp32+cast copies don't stay resident forever.
_cast_cache: dict = {}
_CAST_CACHE_MAX = 4


def _cast_params(params, dtype):
    key = (id(params), jnp.dtype(dtype).name)
    hit = _cast_cache.get(key)
    if hit is not None and hit[0] is params:
        return hit[1]
    cast = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params
    )
    while len(_cast_cache) >= _CAST_CACHE_MAX:
        _cast_cache.pop(next(iter(_cast_cache)))
    _cast_cache[key] = (params, cast)
    return cast


def predict_normals(params, image_hwc01: jax.Array, network_dim=(480, 640),
                    compute_dtype=None, coarse_hw=None):
    """Run NNET, returning (normals (H, W, 3), kappa (H, W, 1)) resized back
    to the input resolution.  One jitted dispatch end to end — resize,
    normalize, network and back-resize all fuse on device.

    ``compute_dtype=jnp.bfloat16`` runs the net at MXU rate (outputs are
    re-normalized unit normals; bf16 noise ~2e-3 is far below the net's own
    uncertainty).  None keeps float32 (checkpoint-validation parity).
    ``coarse_hw``: additionally nearest-subsample the outputs on device
    (the frontend's integration shape) so only the coarse field crosses
    the host boundary."""
    if compute_dtype is not None:
        params = _cast_params(params, compute_dtype)
    return _predict_normals_jit(
        params, image_hwc01, tuple(network_dim), image_hwc01.shape[:2],
        compute_dtype,
        tuple(coarse_hw) if coarse_hw is not None else None,
    )
