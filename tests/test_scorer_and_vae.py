"""Data-QA scorers (Utility/Scorer.py equivalent) + EmbeddingVAE."""

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.data.scorer import (
    AlignmentScorer,
    TTSScorer,
    ctc_outlier_filter,
    remove_samples,
)
from toucan_tpu.models.aligner import Aligner
from toucan_tpu.models.embedding_vae import EmbeddingVAE
from toucan_tpu.models.toucan_tts import ToucanTTS


def _tiny_dataset(n=4, seed=0):
    rng = np.random.RandomState(seed)
    data = []
    for i in range(n):
        t = 6 + i
        durations = rng.randint(1, 4, size=t).astype(np.int32)
        l = int(durations.sum())
        data.append(dict(
            text=(rng.rand(t, 62) > 0.5).astype(np.float32),
            mel=rng.randn(l, 80).astype(np.float32),
            durations=durations,
            pitch=rng.randn(t).astype(np.float32),
            energy=rng.randn(t).astype(np.float32),
            lang_id=12,
        ))
    return data


def test_alignment_scorer_ranks_and_filters():
    data = _tiny_dataset()
    variables = Aligner().init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 80)))
    scorer = AlignmentScorer(variables)
    scores = scorer.score(data)
    assert scores.shape == (4,) and np.isfinite(scores).all()
    worst = scorer.worst_n(2)
    assert len(worst) == 2
    assert scores[worst[0]] == scores.max()

    kept = remove_samples(data, worst)
    assert len(kept) == 2

    # outlier filter: no-op below min_size, drops the planted outlier above
    assert ctc_outlier_filter(data, scores, min_size=300) is data
    big_scores = np.ones(400)
    big_scores[7] = 100.0
    big_data = list(range(400))
    filtered = ctc_outlier_filter(big_data, big_scores, min_size=300)
    assert len(filtered) == 399 and 7 not in filtered


def test_tts_scorer_ranks_and_finds_nans():
    from tests.test_train_dist import TINY

    data = _tiny_dataset()
    model = ToucanTTS(TINY)
    d0 = data[0]
    t, l = len(d0["text"]), len(d0["mel"])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(d0["text"][None]), jnp.asarray([t]),
        jnp.asarray(d0["mel"][None]), jnp.asarray([l]),
        jnp.asarray(d0["durations"][None]),
        jnp.asarray(d0["pitch"].reshape(1, t, 1)),
        jnp.asarray(d0["energy"].reshape(1, t, 1)),
        utterance_embedding=jnp.zeros((1, 64)),
        lang_ids=jnp.asarray([[12]]), run_glow=False)
    utt = np.zeros((4, 64), np.float32)
    scorer = TTSScorer(variables, TINY)
    scores = scorer.score(data, utt_embeddings=utt)
    assert scores.shape == (4,) and np.isfinite(scores).all()
    assert scores[scorer.worst_n(1)[0]] == scores.max()
    assert scorer.nan_indexes() == []

    # a corrupted sample surfaces as non-finite and gets removed
    data[2]["mel"] = np.full_like(data[2]["mel"], np.nan)
    scores = scorer.score(data, utt_embeddings=utt)
    assert 2 in scorer.nan_indexes()
    cleaned = remove_samples(data, scorer.nan_indexes())
    assert len(cleaned) == 3


def test_embedding_vae_train_and_sample():
    vae = EmbeddingVAE()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 64))
    variables = vae.init(rng, x, rng)
    recon, kl, rec = vae.apply(variables, x, jax.random.PRNGKey(1))
    assert recon.shape == (8, 64)
    assert np.isfinite(float(kl)) and np.isfinite(float(rec))

    # one gradient step reduces the loss on the same batch
    import optax
    opt = optax.adam(1e-3)
    state = opt.init(variables)

    def loss_fn(v):
        _, kl_, rec_ = vae.apply(v, x, jax.random.PRNGKey(1))
        return kl_ + rec_

    l0, grads = jax.value_and_grad(loss_fn)(variables)
    updates, state = opt.update(grads, state, variables)
    v2 = optax.apply_updates(variables, updates)
    assert float(loss_fn(v2)) < float(l0)

    # sampling path: (1, 64) artificial speaker embedding, finite
    sample = vae.apply(variables, rng=jax.random.PRNGKey(2))
    assert sample.shape == (1, 64) and np.isfinite(np.asarray(sample)).all()
    # deterministic given z
    z = jnp.ones((2, 16))
    s1 = vae.apply(variables, z=z)
    s2 = vae.apply(variables, z=z)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
