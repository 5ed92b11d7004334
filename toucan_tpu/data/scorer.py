"""Data-quality scoring (``Utility/Scorer.py`` equivalent).

AlignmentScorer ranks utterances by aligner CTC loss; TTSScorer ranks by
the ToucanTTS training loss of a trained model.  Both can surface the worst
samples and produce filtered dataset copies (the reference pops them from
the cache in place).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.frontend.inventory import vectors_to_ctc_ids
from toucan_tpu.models.aligner import Aligner, ctc_loss
from toucan_tpu.models.toucan_tts import ToucanTTS
from toucan_tpu.train.losses import toucan_tts_loss


class AlignmentScorer:
    def __init__(self, aligner_variables):
        self.variables = aligner_variables
        self.aligner = Aligner()
        self.scores = None

    def score(self, dataset):
        """dataset: list of datapoint dicts with 'mel' and 'text'."""
        scores = []
        for d in dataset:
            mel = jnp.asarray(np.asarray(d["mel"], np.float32)[None])
            tokens = vectors_to_ctc_ids(np.asarray(d["text"]))
            logits = self.aligner.apply(self.variables, mel)
            loss = ctc_loss(logits, jnp.asarray([mel.shape[1]]),
                            jnp.asarray([tokens]), jnp.asarray([len(tokens)]))
            scores.append(float(loss))
        self.scores = np.asarray(scores)
        return self.scores

    def worst_n(self, n: int):
        assert self.scores is not None, "call score() first"
        return list(np.argsort(self.scores)[::-1][:n])


class TTSScorer:
    def __init__(self, tts_variables, config, gst_variables=None):
        self.variables = tts_variables
        self.model = ToucanTTS(config)
        self.gst_variables = gst_variables
        self.scores = None

    def score(self, dataset, utt_embeddings=None):
        from toucan_tpu.models.gst import StyleEmbedding

        scores = []
        gst = StyleEmbedding()
        for i, d in enumerate(dataset):
            t = len(d["text"])
            l = len(d["mel"])
            if utt_embeddings is not None:
                utt = jnp.asarray(utt_embeddings[i][None])
            elif self.gst_variables is not None:
                utt = gst.apply(self.gst_variables,
                                jnp.asarray(np.asarray(d["mel"], np.float32)[None]),
                                jnp.asarray([l]))
            else:
                utt = None
            outs = self.model.apply(
                self.variables,
                jnp.asarray(np.asarray(d["text"], np.float32)[None]),
                jnp.asarray([t]),
                jnp.asarray(np.asarray(d["mel"], np.float32)[None]),
                jnp.asarray([l]),
                jnp.asarray(np.asarray(d["durations"], np.int32)[None]),
                jnp.asarray(np.reshape(d["pitch"], (1, t, 1)).astype(np.float32)),
                jnp.asarray(np.reshape(d["energy"], (1, t, 1)).astype(np.float32)),
                utterance_embedding=utt,
                lang_ids=jnp.asarray([[d.get("lang_id", 0)]]),
                run_glow=False)
            before, after, d_pred, p_pred, e_pred, _ = outs
            l1, dl, pl, el = toucan_tts_loss(
                before, after, jnp.asarray(np.asarray(d["mel"], np.float32)[None]),
                jnp.asarray([l]), jnp.asarray([t]),
                jnp.asarray(np.asarray(d["durations"], np.int32)[None]),
                d_pred, p_pred, e_pred,
                jnp.asarray(np.reshape(d["pitch"], (1, t, 1)).astype(np.float32)),
                jnp.asarray(np.reshape(d["energy"], (1, t, 1)).astype(np.float32)))
            total = float(l1 + dl + pl + el)
            scores.append(total if np.isfinite(total) else float("inf"))
        self.scores = np.asarray(scores)
        return self.scores

    def worst_n(self, n: int):
        assert self.scores is not None, "call score() first"
        return list(np.argsort(self.scores)[::-1][:n])

    def nan_indexes(self):
        assert self.scores is not None, "call score() first"
        return list(np.flatnonzero(~np.isfinite(self.scores)))


def remove_samples(dataset, indices):
    """Filtered copy with the given indices removed (reference pops them
    from the cache; we return a new list)."""
    drop = set(indices)
    return [d for i, d in enumerate(dataset) if i not in drop]


def ctc_outlier_filter(dataset, scores, sigma: float = 1.5, min_size: int = 300):
    """Drop samples whose CTC loss exceeds mean + sigma*std when the corpus
    is large enough (``FastSpeechDataset.py:151-160``)."""
    if len(dataset) <= min_size:
        return dataset
    scores = np.asarray(scores)
    threshold = scores.mean() + sigma * scores.std(ddof=1)
    return [d for d, s in zip(dataset, scores) if s <= threshold]
