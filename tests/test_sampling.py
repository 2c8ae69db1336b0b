"""Bilinear sampler verified element-wise against torch.grid_sample —
the reference's exact primitive (core/dense_optim.py:128-140).

torch (CPU) is used as a *test oracle only*; the framework itself is
torch-free.
"""

import jax.numpy as jnp
import numpy as np
import torch

from super_primitive_tpu.ops.sampling import bilinear_sample, sample_at_pixels


def torch_reference(img_chw, coords_norm):
    """The reference's img_interp (core/dense_optim.py:128-140)."""
    img = torch.from_numpy(img_chw)[None]
    x = torch.from_numpy(coords_norm)[None, None]  # (1, 1, N, 2)
    valid = (torch.abs(x[0, 0]) <= 0.99).all(dim=-1)
    out = torch.nn.functional.grid_sample(
        img, x, mode="bilinear", padding_mode="zeros", align_corners=True
    )
    return out[0, :, 0].numpy(), valid.numpy()  # (C, N), (N,)


def rand_case(seed, H=37, W=53, C=3, N=500, lo=-1.3, hi=1.3):
    r = np.random.default_rng(seed)
    img = r.uniform(0, 1, size=(C, H, W)).astype(np.float32)
    coords = r.uniform(lo, hi, size=(N, 2)).astype(np.float32)
    return img, coords


class TestBilinearSample:
    def test_matches_grid_sample_inside(self):
        img, coords = rand_case(0, lo=-0.95, hi=0.95)
        ref_vals, ref_valid = torch_reference(img, coords)
        vals, valid = bilinear_sample(jnp.asarray(img.transpose(1, 2, 0)), jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(vals).T, ref_vals, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(valid), ref_valid)

    def test_matches_grid_sample_with_padding(self):
        img, coords = rand_case(1, lo=-1.5, hi=1.5)
        ref_vals, ref_valid = torch_reference(img, coords)
        vals, valid = bilinear_sample(jnp.asarray(img.transpose(1, 2, 0)), jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(vals).T, ref_vals, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(valid), ref_valid)

    def test_integer_coords_exact(self):
        r = np.random.default_rng(2)
        img = r.uniform(0, 1, size=(11, 13, 2)).astype(np.float32)
        px = np.stack(
            [r.integers(0, 13, size=40), r.integers(0, 11, size=40)], axis=-1
        ).astype(np.float32)
        vals, _ = sample_at_pixels(jnp.asarray(img), jnp.asarray(px))
        expected = img[px[:, 1].astype(int), px[:, 0].astype(int)]
        np.testing.assert_allclose(np.asarray(vals), expected, atol=1e-6)

    def test_validity_bound(self):
        img = np.zeros((8, 8, 1), dtype=np.float32)
        coords = jnp.asarray([[0.0, 0.0], [0.99, 0.0], [0.991, 0.0], [-1.0, 0.5]])
        _, valid = bilinear_sample(jnp.asarray(img), coords)
        np.testing.assert_array_equal(np.asarray(valid), [True, True, False, False])

    def test_batched_leading_dims(self):
        img, coords = rand_case(3, N=60)
        coords_b = coords.reshape(4, 15, 2)
        vals, valid = bilinear_sample(jnp.asarray(img.transpose(1, 2, 0)), jnp.asarray(coords_b))
        assert vals.shape == (4, 15, 3)
        assert valid.shape == (4, 15)
        flat_vals, _ = bilinear_sample(
            jnp.asarray(img.transpose(1, 2, 0)), jnp.asarray(coords)
        )
        np.testing.assert_allclose(np.asarray(vals).reshape(60, 3), np.asarray(flat_vals))


class TestPackedTaps:
    def test_packed_grad_matches_unpacked_on_valid(self):
        from super_primitive_tpu.ops.sampling import (
            bilinear_sample_grad,
            bilinear_sample_grad_packed,
            pack_bilinear_taps,
        )

        r = np.random.default_rng(5)
        img = r.uniform(0, 1, size=(17, 23, 3)).astype(np.float32)
        coords = r.uniform(-1.3, 1.3, size=(500, 2)).astype(np.float32)
        s0, d0, v0 = bilinear_sample_grad(jnp.asarray(img), jnp.asarray(coords))
        packed = pack_bilinear_taps(jnp.asarray(img))
        s1, d1, v1 = bilinear_sample_grad_packed(packed, jnp.asarray(coords))
        v = np.asarray(v0)
        np.testing.assert_array_equal(v, np.asarray(v1))
        np.testing.assert_allclose(
            np.asarray(s1)[v], np.asarray(s0)[v], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(d1)[v], np.asarray(d0)[v], atol=1e-5
        )

    def test_pack_layout(self):
        from super_primitive_tpu.ops.sampling import pack_bilinear_taps

        img = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
        p = np.asarray(pack_bilinear_taps(jnp.asarray(img)))
        # interior cell (1, 1): taps are img[1,1], img[1,2], img[2,1], img[2,2]
        np.testing.assert_array_equal(p[1, 1], [5, 6, 9, 10])
        # last column/row shift in zeros
        np.testing.assert_array_equal(p[1, 3], [7, 0, 11, 0])
        np.testing.assert_array_equal(p[2, 3], [11, 0, 0, 0])
