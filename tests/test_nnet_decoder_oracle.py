"""Cross-check the Flax NNET decoder against the reference's *vendored*
torch decoder definition (frontend/normals/scannet_model.py:53-139).

The scannet checkpoint itself is not available offline, and neither are
geffnet / segment_anything — but the decoder's torch source ships inside the
reference repo, so loading it with shared random weights is the one
real-architecture oracle we can run without network.  Any mismatch in the
decoder wiring (hypercolumn order, upsample semantics, norm_normalize, the
1x1-Conv1d refine stacks) fails here.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from super_primitive_tpu.nets import convert
from super_primitive_tpu.nets.nnet import NNET

from test_convert import synth_nnet_state_dict

REF_MODEL = "/root/reference/frontend/normals/scannet_model.py"

# The oracle needs the reference checkout; skip (not fail) when it is absent
# so the suite does not silently depend on that absolute path existing.
import os  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MODEL),
    reason=f"reference torch decoder not available at {REF_MODEL}",
)


def _load_reference_decoder_module():
    """Import the reference model file with geffnet stubbed out (only the
    Encoder class touches geffnet; we instantiate the Decoder alone)."""
    if "geffnet" not in sys.modules:
        stub = types.ModuleType("geffnet")

        def _unavailable(*a, **k):  # pragma: no cover
            raise RuntimeError("geffnet is not installed in this container")

        stub.create_model = _unavailable
        sys.modules["geffnet"] = stub
    spec = importlib.util.spec_from_file_location("ref_scannet_model", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_decoder():
    mod = _load_reference_decoder_module()
    torch.manual_seed(0)
    dec = mod.Decoder()
    # randomize BN affine + running stats so the check exercises the real
    # eval-mode BN math, not the zeros/ones defaults
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in dec.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(0.5 + torch.rand(m.running_var.shape, generator=g))
    dec.eval()
    return dec


def test_decoder_matches_vendored_torch(ref_decoder):
    r = np.random.default_rng(7)
    # taps for a 64x96 input: b0 24ch@1/2, b1 40ch@1/4, b2 64ch@1/8,
    # b3 176ch@1/16, b4 2048ch@1/32  (scannet_model.py:96)
    shapes = [(1, 24, 32, 48), (1, 40, 16, 24), (1, 64, 8, 12),
              (1, 176, 4, 6), (1, 2048, 2, 3)]
    taps_t = [torch.from_numpy(r.normal(size=s).astype(np.float32) * 0.3)
              for s in shapes]

    # the reference Decoder indexes features[4],[5],[6],[8],[11]
    features = [None] * 12
    features[4], features[5], features[6] = taps_t[0], taps_t[1], taps_t[2]
    features[8], features[11] = taps_t[3], taps_t[4]
    with torch.no_grad():
        (out_t,), _, _ = ref_decoder(features)
    want = out_t.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    # shared weights: synthetic encoder entries + the torch decoder's real
    # state_dict under the checkpoint's "decoder." prefix
    sd = synth_nnet_state_dict()
    for k, v in ref_decoder.state_dict().items():
        sd[f"decoder.{k}"] = v.detach().numpy()
    tree = jax.tree.map(jnp.asarray, convert.convert_nnet(sd))

    taps_j = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1)) for t in taps_t]
    got = np.asarray(NNET().apply(tree, None, taps=taps_j))

    assert got.shape == want.shape == (1, 64, 96, 4)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_norm_normalize_matches_vendored_torch():
    mod = _load_reference_decoder_module()
    from super_primitive_tpu.nets.nnet import norm_normalize

    r = np.random.default_rng(3)
    x = r.normal(size=(1, 4, 5, 7)).astype(np.float32) * 2
    with torch.no_grad():
        want = mod.norm_normalize(torch.from_numpy(x)).numpy()
    got = np.asarray(
        norm_normalize(jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)
