"""In-kernel CG (bini_cg_pallas, interpret mode) vs the host-level _pcg."""

import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.integrate.bini import _pcg, _system, _edge_masks, _coefficients
from super_primitive_tpu.ops.pallas_stencil import (
    bini_apply_reference,
    bini_cg_pallas,
)

from test_pallas_stencil import make_system


class TestInKernelCG:
    def test_matches_host_pcg(self):
        q, p_unused, D, masks = make_system(seed=3, N=3, H=16, W=24)
        maskf = jnp.asarray(np.asarray(masks), jnp.float32)
        # build a consistent rhs: b = A x_true for a random masked x_true
        r = np.random.default_rng(0)
        x_true = jnp.asarray(r.normal(size=masks.shape).astype(np.float32)) * maskf
        args = [jnp.broadcast_to(q[k], masks.shape) for k in ("up", "um", "vp", "vm")]
        b, _ = bini_apply_reference(x_true, *args)

        # diagonal of A
        diag = (
            q["up"] + jnp.roll(q["up"], 1, -1)
            + q["um"] + jnp.roll(q["um"], -1, -1)
            + q["vp"] + jnp.roll(q["vp"], 1, -2)
            + q["vm"] + jnp.roll(q["vm"], -1, -2)
        )
        diag_b = jnp.broadcast_to(diag, masks.shape)

        apply_A = lambda x: bini_apply_reference(x, *args)  # noqa: E731
        x_host, _ = _pcg(apply_A, b * maskf, jnp.zeros_like(maskf),
                         jnp.asarray(masks), diag, 500, 1e-7)

        x_kern = bini_cg_pallas(
            b * maskf, jnp.zeros_like(maskf), maskf, diag_b, *args,
            max_iter=500, tol=1e-7, interpret=True,
        )
        m = np.asarray(masks)
        np.testing.assert_allclose(
            np.asarray(x_kern)[m], np.asarray(x_host)[m], atol=2e-4
        )
        # both solve the system: residual small
        res_k = np.asarray(apply_A(x_kern)[0] - b * maskf)
        assert np.abs(res_k[m]).max() < 1e-3
