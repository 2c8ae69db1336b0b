"""Measure axon-relay host<->device transfer characteristics.

The relay adds ~25 ms RTT per dispatch; this probe measures the BANDWIDTH of
device->host fetches and host->device uploads at several sizes, so frontend
numbers (bit-packed mask transfers, feature fetches) can be split into
device compute vs relay transfer — on a directly-attached TPU host the
transfer constants are PCIe-class and vanish.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    for size in (1024, 100 * 1024, 1024**2, 4 * 1024**2, 16 * 1024**2):
        n = size // 4
        host = np.zeros(n, np.float32)
        # upload: asarray + tiny computation + scalar fetch
        up = []
        down = []
        for _ in range(4):
            t0 = time.perf_counter()
            dev = jnp.asarray(host)
            float(np.asarray(f(dev)[0]))
            up.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            back = np.asarray(dev)
            down.append(time.perf_counter() - t0)
            assert back.nbytes == size
        mb = size / 1e6
        print(
            f"{mb:8.2f} MB  up+disp {1000*min(up):7.1f} ms  "
            f"fetch {1000*min(down):7.1f} ms  "
            f"({mb/max(min(down),1e-9):6.1f} MB/s down)",
            flush=True,
        )


if __name__ == "__main__":
    main()
