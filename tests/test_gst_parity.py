"""GST style embedding parity vs the PyTorch reference."""

import numpy as np
import pytest

from tests.conftest import import_reference_module, reference_available

import jax
import jax.numpy as jnp

from toucan_tpu.compat.torch_gst import convert_style_embedding
from toucan_tpu.models.gst import StyleEmbedding, tile_to_fixed_frames

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def test_tile_matches_reference_loop():
    import torch
    rng = np.random.RandomState(0)
    for length in [3, 100, 406, 811, 812, 900]:
        spec = rng.randn(1000, 80).astype(np.float32)
        # reference loop (StyleEmbedding.py:41-52)
        t = torch.tensor(spec[:length])
        t = t.repeat((2, 1))
        while len(t) < 812:
            t = t.repeat((2, 1))
        expect = t[:812].numpy()
        got = np.asarray(tile_to_fixed_frames(jnp.asarray(spec), jnp.asarray(length)))
        np.testing.assert_array_equal(got, expect)


def test_style_embedding_parity():
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Spectrogram_to_Embedding.StyleEmbedding")
    ref = ref_mod.StyleEmbedding()
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(0)
    b, l = 3, 400
    specs = rng.randn(b, l, 80).astype(np.float32)
    lens = np.array([400, 250, 333])

    with torch.no_grad():
        expect = ref(torch.tensor(specs), torch.tensor(lens)).numpy()
        expect_refs = ref(torch.tensor(specs), torch.tensor(lens),
                          return_only_refs=True).numpy()

    model = StyleEmbedding()
    variables = jax.tree.map(jnp.asarray, convert_style_embedding(sd))
    got = model.apply(variables, jnp.asarray(specs), jnp.asarray(lens))
    got_refs = model.apply(variables, jnp.asarray(specs), jnp.asarray(lens),
                           return_only_refs=True)

    assert got.shape == (b, 64)
    np.testing.assert_allclose(np.asarray(got_refs), expect_refs, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got), expect, atol=3e-4)


def test_token_spread_regularizer_matches_reference():
    import torch
    ref_mod = import_reference_module(
        "TrainingInterfaces.Spectrogram_to_Embedding.GST")
    enc = ref_mod.StyleEncoder(gst_tokens=40)  # small so the O(N^2) loop is fast
    expect = float(enc.calculate_ada4_regularization_loss())
    params = {"stl": {"gst_embs": jnp.asarray(enc.stl.gst_embs.detach().numpy())}}
    got = float(StyleEmbedding.token_spread_regularizer(params))
    np.testing.assert_allclose(got, expect, rtol=1e-4)
