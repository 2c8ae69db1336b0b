"""Weight-converter tests: synthetic torch-style state dicts (published
naming schemes) -> Flax trees matching the models' init trees exactly, and
numerical equivalence through the transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_primitive_tpu.nets import convert
from super_primitive_tpu.nets.nnet import NNET
from super_primitive_tpu.nets.sam.image_encoder import VIT_TINY_TEST, ImageEncoderViT
from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder


def tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


# moved to the package so day0_rehearsal.py shares them; re-exported for
# the other test modules that import from here
from super_primitive_tpu.nets.synth import (  # noqa: E402
    synth_nnet_state_dict,
    synth_sam_state_dict,
)


class TestSamConverter:
    def test_tree_matches_init(self):
        cfg = VIT_TINY_TEST
        sd = synth_sam_state_dict(cfg)
        tree = convert.convert_sam(sd, depth=cfg.depth)

        enc = ImageEncoderViT(cfg)
        x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        init_enc = enc.init(jax.random.PRNGKey(0), x)["params"]
        assert tree_shapes(init_enc) == tree_shapes(tree["image_encoder"])
        # converted weights actually run
        out = enc.apply({"params": jax.tree.map(jnp.asarray, tree["image_encoder"])}, x)
        assert np.all(np.isfinite(np.asarray(out)))

        S = cfg.img_size // cfg.patch_size
        pe = PromptEncoder(
            embed_dim=cfg.out_chans, image_embedding_size=(S, S),
            input_image_size=(cfg.img_size, cfg.img_size),
        )
        pts = jnp.zeros((2, 2, 2))
        labels = jnp.zeros((2, 2))
        init_pe = pe.init(jax.random.PRNGKey(1), pts, labels)["params"]
        assert tree_shapes(init_pe) == tree_shapes(tree["prompt_encoder"])

        dec = MaskDecoder(transformer_dim=cfg.out_chans)
        feats = jnp.zeros((1, S, S, cfg.out_chans))
        img_pe = jnp.zeros((1, S, S, cfg.out_chans))
        sparse = jnp.zeros((2, 2, cfg.out_chans))
        dense = jnp.zeros((2, S, S, cfg.out_chans))
        init_dec = dec.init(jax.random.PRNGKey(2), feats, img_pe, sparse, dense)["params"]
        assert tree_shapes(init_dec) == tree_shapes(tree["mask_decoder"])
        masks, iou = dec.apply(
            {"params": jax.tree.map(jnp.asarray, tree["mask_decoder"])},
            feats, img_pe, sparse, dense,
        )
        assert np.all(np.isfinite(np.asarray(masks)))


class TestNnetConverter:
    def test_tree_matches_init(self):
        sd = synth_nnet_state_dict()
        tree = convert.convert_nnet(sd)
        model = NNET()
        x = jnp.zeros((1, 64, 96, 3))
        init = model.init(jax.random.PRNGKey(0), x)
        assert tree_shapes(init["params"]) == tree_shapes(tree["params"])
        assert tree_shapes(init["batch_stats"]) == tree_shapes(tree["batch_stats"])
        out = model.apply(jax.tree.map(jnp.asarray, tree), x)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_strip_module_prefix(self):
        sd = {"module.a.b": 1, "c.d": 2}
        out = convert.strip_module_prefix(sd)
        assert out == {"a.b": 1, "c.d": 2}


class TestValidateCommand:
    """The --validate path (nets/validate.py) must work day-0: Flax-side
    validation runs on converted trees without the torch reference packages
    (which are absent here — the cross-check tier self-skips)."""

    def test_validate_sam_flax_only(self):
        from super_primitive_tpu.nets.validate import validate_sam

        cfg = VIT_TINY_TEST
        sd = synth_sam_state_dict(cfg)
        tree = convert.convert_sam(sd, depth=cfg.depth)
        img = np.random.default_rng(0).integers(
            0, 255, (48, 64, 3), np.uint8
        )
        result = validate_sam(tree, ckpt_path=None, image=img, cfg=cfg)
        assert "flax_embed_std" in result and result["flax_embed_std"] > 0

    def test_validate_nnet_flax_only(self):
        from super_primitive_tpu.nets.validate import validate_nnet

        sd = synth_nnet_state_dict()
        tree = convert.convert_nnet(sd)
        img = np.random.default_rng(1).integers(
            0, 255, (48, 64, 3), np.uint8
        )
        result = validate_nnet(tree, image=img, network_dim=(64, 96))
        assert "flax_norm_len_mean" in result
        assert abs(result["flax_norm_len_mean"] - 1.0) < 1e-3


class TestNumericTransforms:
    def test_dense_transform(self):
        import torch

        lin = torch.nn.Linear(5, 7)
        x = torch.randn(3, 5)
        want = lin(x).detach().numpy()
        sd = {"l.weight": lin.weight.detach().numpy(), "l.bias": lin.bias.detach().numpy()}
        p = convert._dense(sd, "l")
        got = np.asarray(x.numpy() @ p["kernel"] + p["bias"])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conv_transform(self):
        import torch

        conv = torch.nn.Conv2d(3, 8, 3, padding=1)
        x = torch.randn(1, 3, 10, 12)
        want = conv(x).detach().numpy().transpose(0, 2, 3, 1)
        sd = {"c.weight": conv.weight.detach().numpy(), "c.bias": conv.bias.detach().numpy()}
        import flax.linen as fnn

        p = convert._conv(sd, "c")
        mod = fnn.Conv(8, (3, 3), padding=1)
        got = mod.apply(
            {"params": {"kernel": jnp.asarray(p["kernel"]), "bias": jnp.asarray(p["bias"])}},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_conv_transpose_transform(self):
        import torch

        conv = torch.nn.ConvTranspose2d(6, 4, 2, stride=2)
        x = torch.randn(1, 6, 5, 7)
        want = conv(x).detach().numpy().transpose(0, 2, 3, 1)
        sd = {"c.weight": conv.weight.detach().numpy(), "c.bias": conv.bias.detach().numpy()}
        import flax.linen as fnn

        p = convert._conv_transpose(sd, "c")
        mod = fnn.ConvTranspose(4, (2, 2), strides=(2, 2))
        got = mod.apply(
            {"params": {"kernel": jnp.asarray(p["kernel"]), "bias": jnp.asarray(p["bias"])}},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
