"""Pallas BiNI stencil kernel: interpret-mode parity with the reference math
and with the original _apply_A composition."""

import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.integrate.bini import (
    _apply_A,
    _coefficients,
    _edge_masks,
    _system,
)
from super_primitive_tpu.ops.pallas_stencil import (
    bini_apply_pallas,
    bini_apply_reference,
)


def make_system(seed=0, N=3, H=16, W=24):
    r = np.random.default_rng(seed)
    K = jnp.asarray([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1.0]])
    normals = r.normal(size=(H, W, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    masks = r.uniform(size=(N, H, W)) > 0.4
    D, c_u, c_v = _coefficients(jnp.asarray(normals), K)
    em = {k: v.astype(jnp.float32) for k, v in _edge_masks(jnp.asarray(masks)).items()}
    w_u = jnp.asarray(r.uniform(0.2, 0.8, (N, H, W)).astype(np.float32))
    w_v = jnp.asarray(r.uniform(0.2, 0.8, (N, H, W)).astype(np.float32))
    q, b, diag = _system(D, c_u, c_v, em, w_u, w_v)
    p = jnp.asarray(r.normal(size=(N, H, W)).astype(np.float32)) * masks
    return q, p, D, masks


class TestPallasStencil:
    def test_interpret_matches_reference_math(self):
        q, p, D, masks = make_system()
        args = [p] + [jnp.broadcast_to(q[k], p.shape) for k in ("up", "um", "vp", "vm")]
        ap_ref, dot_ref = bini_apply_reference(*args)
        ap_pl, dot_pl = bini_apply_pallas(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(ap_pl), np.asarray(ap_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot_pl), np.asarray(dot_ref), rtol=1e-5)

    def test_matches_original_apply_A(self):
        q, p, D, masks = make_system(1)
        ap_old = _apply_A(p, D, q)
        args = [p] + [jnp.broadcast_to(q[k], p.shape) for k in ("up", "um", "vp", "vm")]
        ap_new, _ = bini_apply_reference(*args)
        np.testing.assert_allclose(np.asarray(ap_new), np.asarray(ap_old), atol=1e-5)

    def test_dot_is_masked_dot(self):
        # Ap is supported inside the mask, so the unmasked dot equals the
        # masked one
        q, p, D, masks = make_system(2)
        args = [p] + [jnp.broadcast_to(q[k], p.shape) for k in ("up", "um", "vp", "vm")]
        ap, dot = bini_apply_reference(*args)
        masked = jnp.sum(p * ap * masks, axis=(-2, -1))
        np.testing.assert_allclose(np.asarray(dot), np.asarray(masked), rtol=1e-5)
