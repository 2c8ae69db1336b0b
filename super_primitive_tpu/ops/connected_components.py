"""Batched 2D connected-component labeling on device.

Replaces ``cupyx.scipy.ndimage.label`` with the batch-isolating structure
(reference: frontend/segment/post_processer.py:39-64; the 3D structure with
empty pre/post planes exists precisely to prevent cross-batch merging —
here batching is native).

Algorithm: iterative min-label propagation — initialize every foreground
pixel with its linear index, repeatedly take the min over the 4-neighborhood
(masked), until fixpoint.  Runs as a ``lax.while_loop`` of pure stencil ops;
worst-case iterations bounded by the longest geodesic path, with an 8-step
jump between convergence checks to amortize the reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _propagate_once(labels: jax.Array, mask: jax.Array) -> jax.Array:
    big = jnp.asarray(jnp.iinfo(labels.dtype).max, labels.dtype)

    def shift(x, dr, dc):
        x = jnp.roll(x, (dr, dc), axis=(-2, -1))
        H, W = x.shape[-2], x.shape[-1]
        if dr == 1:
            x = x.at[..., 0, :].set(big)
        if dr == -1:
            x = x.at[..., H - 1, :].set(big)
        if dc == 1:
            x = x.at[..., :, 0].set(big)
        if dc == -1:
            x = x.at[..., :, W - 1].set(big)
        return x

    m = jnp.minimum(
        jnp.minimum(shift(labels, 1, 0), shift(labels, -1, 0)),
        jnp.minimum(shift(labels, 0, 1), shift(labels, 0, -1)),
    )
    out = jnp.minimum(labels, m)
    return jnp.where(mask, out, big)


def _seg_min_scan(vals: jax.Array, boundary: jax.Array, axis: int,
                  reverse: bool = False) -> jax.Array:
    """Segmented min-scan: propagate the running minimum of ``vals`` along
    ``axis``, resetting wherever ``boundary`` is True.  Pure elementwise +
    log-depth scan — no gathers (gathers made the old pointer-jump CC cost
    ~1.9 s/chunk on the TPU; full scans are ~1000x cheaper per sweep)."""

    def op(a, b):
        av, ab = a
        bv, bb = b
        return jnp.where(bb, bv, jnp.minimum(av, bv)), ab | bb

    v, _ = jax.lax.associative_scan(
        op, (vals, boundary), axis=axis, reverse=reverse
    )
    return v


@jax.jit
def label_components(masks: jax.Array) -> jax.Array:
    """Label 4-connected components of (N, H, W) boolean masks.

    Returns int32 labels: background -1; foreground pixels share a label iff
    connected within their own mask (labels are component-root linear
    indices, unique within each batch element; NOT renumbered 1..K — use
    :func:`relabel_consecutive_np` for that).

    Algorithm: alternating row/column segmented min-scans (labels flood
    entire straight runs per sweep, so iteration count ~ the number of
    "turns" in the worst component's geodesic — 2-4 for blob-shaped masks)
    with one pointer-jump per sweep to collapse long snaking paths, inside a
    fixpoint ``while_loop``.
    """
    N, H, W = masks.shape
    big = jnp.iinfo(jnp.int32).max
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(1, H, W)
    labels = jnp.where(masks, jnp.broadcast_to(lin, masks.shape), big)
    bg = ~masks  # scan reset points

    def sweep(l):
        l = _seg_min_scan(l, bg, axis=2)
        l = _seg_min_scan(l, bg, axis=2, reverse=True)
        l = _seg_min_scan(l, bg, axis=1)
        l = _seg_min_scan(l, bg, axis=1, reverse=True)
        return jnp.where(masks, l, big)

    def jump(l):
        # label <- min(label, label[label]): one gather per sweep squares
        # the effective propagation distance along winding paths
        flat = l.reshape(N, H * W)
        idx = jnp.clip(flat, 0, H * W - 1)
        jumped = jnp.take_along_axis(flat, idx, axis=1).reshape(N, H, W)
        return jnp.where(masks, jnp.minimum(l, jumped), big)

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < H * W)

    def body(state):
        l, _, it = state
        new = jump(sweep(l))
        return new, jnp.any(new != l), it + 1

    # two unrolled sweeps handle the common blob case without paying the
    # while_loop's per-iteration convergence reduction
    labels = sweep(sweep(labels))
    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True), 0)
    )
    return jnp.where(masks, labels, -1)


_native_checked = False
_native_fn = None


def _native_label():
    """ctypes handle for the C++ batched union-find labeler (csrc/cc.cpp);
    None when the native lib is unavailable."""
    global _native_checked, _native_fn
    if _native_checked:
        return _native_fn
    _native_checked = True
    try:
        import ctypes

        from ..data.native_loader import get_lib

        lib = get_lib()
        if lib:
            lib.sp_label_components.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
            _native_fn = lib.sp_label_components
    except Exception:
        _native_fn = None
    return _native_fn


def label_components_native(masks: np.ndarray, num_threads: int | None = None):
    """Host-native batched CC via csrc/cc.cpp (union-by-min => identical
    label semantics to :func:`label_components`).  Returns None when the
    native lib is unavailable."""
    import ctypes

    fn = _native_label()
    if fn is None:
        return None
    if num_threads is None:
        # oversubscription is a real cost, not a wash: on a 1-core host an
        # 8-thread pool contending with the TPU-relay I/O threads measured
        # 10-500 ms for the same call (e2e split_cc variance)
        import os

        num_threads = min(8, os.cpu_count() or 1)
    masks = np.ascontiguousarray(np.asarray(masks), np.uint8)
    N, H, W = masks.shape
    out = np.empty((N, H, W), np.int32)
    fn(
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), N, H, W,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads,
    )
    return out


def _label_components_host(masks: np.ndarray) -> np.ndarray:
    """scipy fallback with identical label semantics (component-root linear
    index, background -1)."""
    from scipy import ndimage

    N, H, W = masks.shape
    out = np.full(masks.shape, -1, np.int32)
    lin = np.arange(H * W, dtype=np.int32).reshape(H, W)
    structure = np.asarray([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for i in range(N):
        lab, k = ndimage.label(masks[i], structure=structure)
        for c in range(1, k + 1):
            comp = lab == c
            out[i][comp] = lin[comp].min()
    return out


def label_components_chunked(masks, chunk: int = 64):
    """Host-entry labeling: masks arrive on host, labels are consumed on host
    (the per-keyframe split loop), so the fast path is the native C++
    union-find (csrc/cc.cpp, ~10 ms for 70x240x320 vs ~1.5 s for the device
    round-trip under the relay).  Falls back to device chunks (bounded: the
    axon worker faults past N~64 at 240x320) and then host scipy."""
    import jax.numpy as jnp

    masks = np.asarray(masks)
    native = label_components_native(masks)
    if native is not None:
        return native
    N = masks.shape[0]
    out = np.empty(masks.shape, np.int32)
    device_ok = True
    for lo in range(0, N, chunk):
        part = masks[lo : lo + chunk]
        n = part.shape[0]
        if n < chunk:
            part = np.concatenate(
                [part, np.zeros((chunk - n,) + masks.shape[1:], masks.dtype)]
            )
        if device_ok:
            try:
                out[lo : lo + n] = np.asarray(
                    label_components(jnp.asarray(part))
                )[:n]
                continue
            except Exception as e:  # device/worker fault: degrade, don't die
                import sys

                print(
                    f"[connected_components] device labeling failed ({e!r}); "
                    "falling back to host scipy for this keyframe",
                    file=sys.stderr,
                )
                device_ok = False
        out[lo : lo + n] = _label_components_host(part[:n].astype(bool))
    return out


def relabel_consecutive_np(labels: np.ndarray) -> tuple[np.ndarray, int]:
    """Renumber one (H, W) label image to consecutive 0..K-1 over unique
    labels (background -1 included as a label, matching the reference's
    remap_labels_to_arange over the raw cupy output,
    post_processer.py:86-96)."""
    labels = np.asarray(labels)
    uniq = np.unique(labels)
    out = np.searchsorted(uniq, labels)
    return out.astype(np.int32), len(uniq)
