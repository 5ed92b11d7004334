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


def test_dijkstra_is_valid_monotonic_path():
    from toucan_tpu.models.aligner import dijkstra_numpy

    rng = np.random.RandomState(7)
    costs = rng.uniform(0.05, 1.0, size=(50, 9))
    path = dijkstra_numpy(costs)
    assert path.shape == (50, 9)
    assert (path.sum(1) == 1).all()  # one token per frame
    js = path.argmax(1)
    assert js[0] >= 0 and js[-1] == 8
    assert ((np.diff(js) == 0) | (np.diff(js) == 1)).all()  # monotone


def test_dijkstra_recovers_sharp_diagonal():
    from toucan_tpu.models.aligner import dijkstra_numpy

    frames, tokens = 24, 6
    pred = np.full((frames, tokens), 0.01)
    for i in range(frames):
        pred[i, min(i // 4, tokens - 1)] = 0.95
    path = dijkstra_numpy(1.0 - pred)
    np.testing.assert_array_equal(path.argmax(1),
                                  np.minimum(np.arange(frames) // 4, tokens - 1))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_dijkstra_matches_reference_scipy_path():
    """Grid parity with the reference's sparse-graph Dijkstra
    (Aligner.py:141-199,245-280): same adjacency semantics (right/down/diag
    moves, target-cell edge weights), same last-token-per-frame collapse."""
    from scipy.sparse.csgraph import dijkstra as scipy_dijkstra

    from toucan_tpu.models.aligner import dijkstra_numpy

    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.AutoAligner.Aligner")
    rng = np.random.RandomState(11)
    for trial in range(5):
        frames, tokens = rng.randint(10, 40), rng.randint(3, 12)
        pred_max = rng.uniform(0.0, 0.99, size=(frames, tokens))
        path_probs = 1.0 - pred_max  # strictly positive edge weights

        # the reference path (Aligner.py:141-162)
        adj = ref_mod.to_adj_matrix(path_probs)
        dist_matrix, predecessors = scipy_dijkstra(
            csgraph=adj, directed=True, indices=0, return_predecessors=True)
        path = []
        pr_index = predecessors[-1]
        while pr_index != 0:
            path.append(pr_index)
            pr_index = predecessors[pr_index]
        path.reverse()
        path = [0] + path + [dist_matrix.size - 1]
        mel_text = {}
        for node_index in path:
            i, j = ref_mod.from_node_index(node_index, tokens)
            mel_text[i] = j
        expect = np.zeros_like(pred_max)
        for i in mel_text:
            expect[i][mel_text[i]] = 1.0

        got = dijkstra_numpy(path_probs)
        np.testing.assert_array_equal(got, expect, err_msg=f"trial {trial}")


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_alignment_from_logits_dijkstra_matches_reference_inference():
    """logits -> dijkstra path equality with Aligner.inference(pathfinding=
    'dijkstra')."""
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.AutoAligner.Aligner")
    ref = ref_mod.Aligner()
    ref.eval()
    rng = np.random.RandomState(5)
    mel = rng.randn(40, 80).astype(np.float32)
    tokens = np.array([4, 9, 2, 17, 33])
    with torch.no_grad():
        pred_max = ref(torch.tensor(mel)[None])[0].numpy()[:, tokens]
    if (1.0 - pred_max).min() <= 0:
        pytest.skip("negative edge weights: scipy dijkstra undefined there")
    expect = ref.inference(torch.tensor(mel), torch.tensor(tokens), train=True,
                           pathfinding="dijkstra")

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = Aligner()
    variables = jax.tree.map(jnp.asarray, convert_aligner(sd))
    logits = np.asarray(model.apply(variables, jnp.asarray(mel[None])))[0]
    got = alignment_from_logits(logits, tokens, method="dijkstra")
    np.testing.assert_array_equal(got, np.asarray(expect))
