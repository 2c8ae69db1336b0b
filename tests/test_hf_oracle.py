"""Architecture oracles: Flax nets vs transformers' independent torch ports.

The real checkpoints are unreachable (no egress), so these tests push SHARED
RANDOM WEIGHTS through two independent implementations of the published
architectures — transformers' torch ``SamModel`` / ``EfficientNetModel`` and
the Flax reimplementations here — via the production converter
(nets/convert.py) and the hf_oracle name mapping.  A mismatch in any
convention (kernel layout, TF SAME padding, window partition, rel-pos
selection, prompt-label semantics, norm eps, decoder wiring) fails loudly.

The SAM test uses a scaled-down config that still exercises every structural
feature of ViT-H: windowed blocks WITH edge padding (grid 6x6, window 4 ->
pad to 8), interleaved global blocks, decomposed rel-pos, the LN neck, the
two-way decoder and all heads.  examples/oracle_sam_vith.py runs the same
comparison at full ViT-H size (one-shot evidence, not CI).

The EfficientNet test runs the FULL B5 architecture (39 blocks, width 1.6 /
depth 2.2) at a reduced even input size where transformers' Keras-style
fixed padding equals dynamic TF SAME (as it does at the production 480x640).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from super_primitive_tpu.nets import convert  # noqa: E402
from super_primitive_tpu.nets.hf_oracle import (  # noqa: E402
    hf_efficientnet_to_geffnet,
    hf_sam_to_original,
    randomize_torch_state,
)


def _max_rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-6)
    return np.abs(a - b).max() / scale


# --------------------------------------------------------------------- SAM
IMG = 96          # patch 16 -> grid 6x6; window 4 pads to 8x8 (edge windows)
EMBED = 64
HEADS = 2
DEPTH = 4
GLOBALS = (1, 3)
WINDOW = 4
OUT_CH = 32       # = prompt/decoder hidden size


@pytest.fixture(scope="module")
def sam_pair():
    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    cfg = SamConfig(
        vision_config=SamVisionConfig(
            hidden_size=EMBED,
            output_channels=OUT_CH,
            num_hidden_layers=DEPTH,
            num_attention_heads=HEADS,
            image_size=IMG,
            patch_size=16,
            window_size=WINDOW,
            global_attn_indexes=list(GLOBALS),
            num_pos_feats=OUT_CH // 2,
        ),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=OUT_CH, image_size=IMG, patch_size=16,
            mask_input_channels=8,
        ),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=OUT_CH, mlp_dim=8 * OUT_CH,
            iou_head_hidden_dim=256,  # Flax MLP iou_head hidden is fixed 256
        ),
        attn_implementation="eager",
    )
    model = SamModel(cfg)
    randomize_torch_state(model, seed=7)
    params = convert.convert_sam(hf_sam_to_original(model.state_dict()), depth=DEPTH)
    return model, params


class TestSamOracle:
    def test_all_keys_mapped(self, sam_pair):
        model, params = sam_pair
        # converter consumed a tree with the full block count and the neck
        assert f"block{DEPTH - 1}" in params["image_encoder"]
        assert "neck_ln2" in params["image_encoder"]

    def test_vision_encoder_matches(self, sam_pair):
        from super_primitive_tpu.nets.sam.image_encoder import (
            ImageEncoderViT,
            ViTConfig,
        )

        model, params = sam_pair
        rng = np.random.default_rng(0)
        img = rng.normal(0, 1, (1, IMG, IMG, 3)).astype(np.float32)

        with torch.no_grad():
            out_t = model.vision_encoder(
                torch.tensor(img.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()  # (1, C, S, S)

        cfg = ViTConfig(
            img_size=IMG, embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
            window_size=WINDOW, global_attn_indexes=GLOBALS, out_chans=OUT_CH,
        )
        out_j = ImageEncoderViT(cfg).apply(
            {"params": params["image_encoder"]}, jnp.asarray(img)
        )
        assert _max_rel(np.moveaxis(np.asarray(out_j), -1, 1), out_t) < 2e-5

    def test_vision_encoder_matches_persistent_ext(self, sam_pair):
        """The shipped production lowering (persistent windows + extended-head
        rel-pos) against torch — not just the reference 'xla' lowering."""
        from super_primitive_tpu.nets.sam.image_encoder import (
            ImageEncoderViT,
            ViTConfig,
        )

        model, params = sam_pair
        rng = np.random.default_rng(1)
        img = rng.normal(0, 1, (1, IMG, IMG, 3)).astype(np.float32)
        with torch.no_grad():
            out_t = model.vision_encoder(
                torch.tensor(img.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()
        cfg = ViTConfig(
            img_size=IMG, embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
            window_size=WINDOW, global_attn_indexes=GLOBALS, out_chans=OUT_CH,
            global_attn_impl="ext", windowed_attn_impl="ext",
            persistent_windows=True,
        )
        out_j = ImageEncoderViT(cfg).apply(
            {"params": params["image_encoder"]}, jnp.asarray(img)
        )
        assert _max_rel(np.moveaxis(np.asarray(out_j), -1, 1), out_t) < 2e-5

    def test_prompt_encoder_and_mask_decoder_match(self, sam_pair):
        from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
        from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

        model, params = sam_pair
        S = IMG // 16
        rng = np.random.default_rng(2)
        emb = rng.normal(0, 0.5, (1, S, S, OUT_CH)).astype(np.float32)
        P = 5
        pts = rng.uniform(0, IMG - 1, (P, 2)).astype(np.float32)  # (x, y) px

        with torch.no_grad():
            out = model(
                image_embeddings=torch.tensor(
                    emb.transpose(0, 3, 1, 2)
                ),
                input_points=torch.tensor(pts.reshape(1, P, 1, 2)),
                input_labels=torch.ones((1, P, 1), dtype=torch.long),
                multimask_output=True,
            )
        masks_t = out.pred_masks[0].numpy()   # (P, 3, 4S, 4S)
        iou_t = out.iou_scores[0].numpy()     # (P, 3)

        pe = PromptEncoder(
            embed_dim=OUT_CH, image_embedding_size=(S, S),
            input_image_size=(IMG, IMG),
        )
        # SAM pads each point prompt with one (0,0)/label=-1 entry (the
        # "not a point"); transformers does the same internally
        pts_pad = np.stack([pts, np.zeros_like(pts)], axis=1)  # (P, 2, 2)
        labels = np.tile(np.asarray([1, -1], np.int32), (P, 1))
        sparse, dense = pe.apply(
            {"params": params["prompt_encoder"]},
            jnp.asarray(pts_pad), jnp.asarray(labels),
        )
        image_pe = pe.apply(
            {"params": params["prompt_encoder"]}, method=PromptEncoder.get_dense_pe
        )
        masks_j, iou_j = MaskDecoder(transformer_dim=OUT_CH).apply(
            {"params": params["mask_decoder"]},
            jnp.asarray(emb), image_pe, sparse, dense,
        )
        assert _max_rel(np.asarray(masks_j)[:, 1:], masks_t) < 2e-5
        assert _max_rel(np.asarray(iou_j)[:, 1:], iou_t) < 2e-5


# ------------------------------------------------------------ EfficientNet
class TestEfficientNetOracle:
    def test_full_b5_architecture_matches(self):
        """Full B5 (39 blocks) with shared random weights: stage taps + the
        pre-bn2 conv_head output the NNET decoder consumes."""
        from transformers.models.efficientnet import (
            EfficientNetConfig,
            EfficientNetModel,
        )

        from super_primitive_tpu.nets.efficientnet import EfficientNetFeatures
        from super_primitive_tpu.nets.synth import synth_nnet_state_dict

        cfg = EfficientNetConfig(
            width_coefficient=1.6,
            depth_coefficient=2.2,
            hidden_dim=2048,           # round_filters(1280) at width 1.6
            batch_norm_eps=1e-3,
            hidden_act="swish",
            depthwise_padding=[],      # Keras adjusted pads everywhere ==
            #                            dynamic TF SAME on even inputs
        )
        model = EfficientNetModel(cfg)
        randomize_torch_state(model, seed=11)

        sd = synth_nnet_state_dict()
        sd.update(hf_efficientnet_to_geffnet(model.state_dict()))
        tree = convert.convert_nnet(sd)

        rng = np.random.default_rng(3)
        # even at every stride-2 conv input: 64x96 -> 32x48 -> 16x24 ->
        # 8x12 -> 4x6 (-> 2x3), exactly as 480x640 is at production size
        img = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)

        with torch.no_grad():
            h = model.embeddings(torch.tensor(img.transpose(0, 3, 1, 2)))
            reps = [int(np.ceil(2.2 * r)) for r in (1, 2, 2, 3, 3, 4, 1)]
            stage_ends = set(np.cumsum(reps) - 1)
            taps_t = []
            for i, blk in enumerate(model.encoder.blocks):
                h = blk(h)
                if i in stage_ends:
                    taps_t.append(h.numpy())
            head_t = model.encoder.top_conv(h).numpy()

        stages_j, head_j = EfficientNetFeatures().apply(
            {
                "params": tree["params"]["encoder"],
                "batch_stats": tree["batch_stats"]["encoder"],
            },
            jnp.asarray(img),
        )
        assert len(stages_j) == len(taps_t) == 7
        for i, (sj, st) in enumerate(zip(stages_j, taps_t)):
            assert _max_rel(np.moveaxis(np.asarray(sj), -1, 1), st) < 2e-5, i
        assert _max_rel(np.moveaxis(np.asarray(head_j), -1, 1), head_t) < 2e-5
