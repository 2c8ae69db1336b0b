#!/usr/bin/env python
"""Profile split_disconnected_segments stage-by-stage on the current backend.

The e2e driver showed the depth-discontinuity split costing ~4.7 s per warm
keyframe (70 segments at 240x320) — this isolates where: upload, disc
dispatch+fetch, CC label dispatch, label fetch, host part loop.

    python examples/profile_split.py [--cpu] [--n 70]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=70)
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from super_primitive_tpu.frontend.post_process import (
        depth_discontinuity,
        split_disconnected_segments,
    )
    from super_primitive_tpu.ops.connected_components import (
        label_components,
        label_components_chunked,
    )

    print(f"[split] backend: {jax.default_backend()}")
    N, (H, W) = args.n, args.hw
    r = np.random.default_rng(0)
    # coherent blobby segments with a depth step through the middle of some
    cy, cx = r.uniform(0, H, N), r.uniform(0, W, N)
    yy, xx = np.mgrid[0:H, 0:W]
    d2 = (yy[None] - cy[:, None, None]) ** 2 + (xx[None] - cx[:, None, None]) ** 2
    lab = np.argmin(d2, axis=0)
    regions = np.stack([lab == i for i in range(N)])
    logdepth = np.log(1.5 + 0.3 * np.sin(xx / 17.0) + 0.001 * yy)[None].repeat(N, 0)
    # put a hard step inside ~20% of segments so some genuinely split
    for i in range(0, N, 5):
        logdepth[i, :, W // 2:] += 0.8
    logdepth = (logdepth * regions).astype(np.float32)
    kps = np.stack([np.clip(cy, 0, H - 1), np.clip(cx, 0, W - 1)], 1).astype(np.int64)

    def t(tag, fn, reps=3):
        fn()  # warm (compile)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        print(f"  {tag:<34}{1000 * min(ts):9.1f} ms")
        return out

    cap = -(-N // 32) * 32
    ld_p = np.zeros((cap, H, W), np.float32); ld_p[:N] = logdepth
    rg_p = np.zeros((cap, H, W), bool); rg_p[:N] = regions

    # stage 1: upload
    up = t("upload ld+regions (padded)", lambda: jax.block_until_ready(
        (jnp.asarray(ld_p), jnp.asarray(rg_p))))

    ld_d, rg_d = jnp.asarray(ld_p), jnp.asarray(rg_p)
    # stage 2: disc dispatch + fetch
    t("disc dispatch+fetch", lambda: np.asarray(
        depth_discontinuity(ld_d, rg_d, 3, 0.1)))

    disc = np.asarray(depth_discontinuity(ld_d, rg_d, 3, 0.1))[:N]
    split_masks = regions & ~disc
    # stage 3: CC chunked (upload + dispatch + label fetch)
    labels = t("CC chunked (up+disp+fetch)", lambda: label_components_chunked(split_masks))

    # stage 4: host part loop
    def host_loop():
        outm = []
        for i in range(N):
            li = labels[i]
            uniq = np.unique(li[li >= 0])
            if uniq.size == 0:
                continue
            parts = li[None] == uniq[:, None, None]
            sizes = parts.reshape(len(uniq), -1).sum(axis=1)
            outm.append((sizes > 76).sum())
        return outm

    t("host part loop (unique+parts)", host_loop)

    # end to end
    t("split_disconnected_segments E2E", lambda: split_disconnected_segments(
        regions, logdepth, kps, 3, 0.1, 1e-3), reps=2)


if __name__ == "__main__":
    main()
