"""Segment Anything (SAM) in Flax: ViT encoder, prompt encoder, mask
decoder, predictor wrapper."""

from . import image_encoder, mask_decoder, predictor, prompt_encoder

__all__ = ["image_encoder", "mask_decoder", "predictor", "prompt_encoder"]
