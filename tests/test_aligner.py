"""Aligner parity vs the PyTorch reference + MAS/CTC correctness."""

import numpy as np
import pytest

from tests.conftest import import_reference_module, reference_available

import jax
import jax.numpy as jnp

from toucan_tpu.compat.torch_aligner import convert_aligner
from toucan_tpu.models.aligner import (
    Aligner,
    alignment_from_logits,
    ctc_loss,
    mas_jax,
    mas_numpy,
)


def test_mas_numpy_is_valid_monotonic_path():
    rng = np.random.RandomState(0)
    scores = rng.randn(30, 8).astype(np.float32)
    opt = mas_numpy(scores)
    assert opt.shape == (30, 8)
    # one token per frame, path starts at 0, ends at last token, monotonic
    assert (opt.sum(1) >= 1).all()
    path = opt.argmax(1)
    assert path[0] == 0 and path[-1] == 7
    assert ((np.diff(path) == 0) | (np.diff(path) == 1)).all()


def test_mas_jax_matches_numpy():
    rng = np.random.RandomState(1)
    for shape in [(20, 5), (50, 12), (7, 7)]:
        scores = rng.randn(*shape).astype(np.float32)
        a = mas_numpy(scores)
        b = np.asarray(mas_jax(jnp.asarray(scores)))
        np.testing.assert_array_equal(a.argmax(1), b.argmax(1))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_mas_matches_reference():
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.AutoAligner.Aligner")
    rng = np.random.RandomState(2)
    scores = rng.randn(40, 10).astype(np.float32)
    expect = ref_mod.binarize_alignment(scores.copy())
    got = mas_numpy(scores)
    np.testing.assert_array_equal(got, expect)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_aligner_forward_parity():
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.AutoAligner.Aligner")
    ref = ref_mod.Aligner()
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(0)
    mel = rng.randn(2, 50, 80).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.tensor(mel)).numpy()

    model = Aligner()
    variables = jax.tree.map(jnp.asarray, convert_aligner(sd))
    got = np.asarray(model.apply(variables, jnp.asarray(mel)))
    np.testing.assert_allclose(got, expect, atol=3e-4)

    # packed-sequence masking: must match the reference's packed forward
    # (convs see the same padded junk; the LSTM stops at each true length)
    lens = np.array([50, 30])
    got_masked = np.asarray(model.apply(variables, jnp.asarray(mel),
                                        lengths=jnp.asarray(lens)))
    with torch.no_grad():
        expect_masked = ref(torch.tensor(mel), lens=torch.tensor(lens)).numpy()
    np.testing.assert_allclose(got_masked[0], expect_masked[0], atol=3e-4)
    np.testing.assert_allclose(got_masked[1, :30], expect_masked[1, :30], atol=3e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_ctc_loss_matches_torch():
    import torch
    rng = np.random.RandomState(0)
    b, t, k, s = 2, 30, 145, 8
    logits = rng.randn(b, t, k).astype(np.float32)
    labels = rng.randint(0, 100, size=(b, s))
    label_lens = np.array([8, 5])
    logit_lens = np.array([30, 25])
    labels[1, 5:] = 0

    criterion = torch.nn.CTCLoss(blank=144, zero_infinity=True)
    expect = criterion(
        torch.tensor(logits).transpose(0, 1).log_softmax(2),
        torch.tensor(labels), torch.tensor(logit_lens), torch.tensor(label_lens))
    got = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                   jnp.asarray(labels), jnp.asarray(label_lens))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_alignment_from_logits_matches_reference_inference():
    """End-to-end: logits -> MAS path equality with Aligner.inference."""
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.AutoAligner.Aligner")
    ref = ref_mod.Aligner()
    ref.eval()
    rng = np.random.RandomState(3)
    mel = rng.randn(60, 80).astype(np.float32)
    tokens = np.array([4, 9, 2, 17, 33, 1])
    expect = ref.inference(torch.tensor(mel), torch.tensor(tokens), train=True)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = Aligner()
    variables = jax.tree.map(jnp.asarray, convert_aligner(sd))
    logits = np.asarray(model.apply(variables, jnp.asarray(mel[None])))[0]
    got = alignment_from_logits(logits, tokens)
    np.testing.assert_array_equal(got.argmax(1), expect.argmax(1))
