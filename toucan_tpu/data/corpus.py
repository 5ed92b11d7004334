"""Corpus preparation: cache building and pipeline orchestration.

Equivalent of the reference's dataset machinery:

* ``AlignerDataset`` (``AutoAligner/AlignerDataset.py``): multiprocess
  fan-out over the file list, per-utterance loudness-norm + resample +
  text features + log-mel, cached to disk;
* ``FastSpeechDataset`` (``FastSpeech2/FastSpeechDataset.py``): aligner
  MAS -> durations (word-boundary insertion + repeated-phone split) +
  token-averaged pitch/energy + CTC outlier filtering;
* ``prepare_fastspeech_corpus`` (``Utility/corpus_preparation.py``):
  aligner cache -> aligner fine-tune -> TTS cache, skipping finished
  stages via cache files.

Caches are npz-based (no torch dependency); speaker embeddings for the
aligner's reconstruction conditioning come from the in-framework GST
(pluggable), replacing the reference's speechbrain ECAPA download.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from functools import partial

import numpy as np

from toucan_tpu.frontend.audio import AudioPreprocessor
from toucan_tpu.frontend.inventory import feature_index, vectors_to_ctc_ids
from toucan_tpu.frontend.text import TextFrontend, language_id


def read_wave(path: str):
    """Load a wav/flac as (float32 mono, sr); soundfile if present, else wave."""
    try:
        from toucan_tpu.utils.optional import optional_import
        wave, sr = optional_import("soundfile").read(path)
        return np.asarray(wave, np.float32), sr
    except ImportError:
        pass
    from scipy.io import wavfile
    sr, wave = wavfile.read(path)
    if wave.dtype == np.int16:
        wave = wave.astype(np.float32) / 32768.0
    elif wave.dtype == np.int32:
        wave = wave.astype(np.float32) / 2147483648.0
    else:
        wave = wave.astype(np.float32)
    return wave, sr


def _process_utterance(item, lang: str, min_len_s: float, max_len_s: float,
                       cut_silence: bool, use_g2p: bool):
    path, transcript = item
    try:
        wave, sr = read_wave(path)
    except Exception:
        return None
    if len(np.shape(wave)) == 2:
        wave = np.mean(wave, axis=1)
    duration_s = len(wave) / sr
    if not (min_len_s <= duration_s <= max_len_s):
        return None
    ap = AudioPreprocessor(input_sr=sr, output_sr=16000, cut_silence=cut_silence)
    try:
        norm_wave = ap.normalize_audio(wave)
    except Exception:
        return None
    fe = TextFrontend(language=lang, use_g2p=use_g2p)
    try:
        text = fe.string_to_features(transcript, input_phonemes=not use_g2p)
    except Exception:
        return None
    if len(text) == 0:
        return None
    from toucan_tpu.frontend.audio import log_mel_spectrogram
    import jax.numpy as jnp
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(norm_wave)))
    return dict(path=path, transcript=transcript, text=text.astype(np.float32),
                wave=norm_wave.astype(np.float32), mel=mel.astype(np.float32))


def build_aligner_cache(path_to_transcript: dict, cache_dir: str, lang: str,
                        loading_processes: int = 8, min_len_s: float = 1.0,
                        max_len_s: float = 20.0, cut_silence: bool = False,
                        use_g2p: bool = True, rebuild_cache: bool = False,
                        speaker_embedding_fn=None):
    """Builds (or loads) the aligner cache; returns a list of datapoints."""
    os.makedirs(cache_dir, exist_ok=True)
    cache_path = os.path.join(cache_dir, "aligner_train_cache.npz")
    if os.path.exists(cache_path) and not rebuild_cache:
        return load_cache(cache_path)

    items = list(path_to_transcript.items())
    worker = partial(_process_utterance, lang=lang, min_len_s=min_len_s,
                     max_len_s=max_len_s, cut_silence=cut_silence, use_g2p=use_g2p)
    if loading_processes > 1 and len(items) > 8:
        with ProcessPoolExecutor(max_workers=loading_processes) as pool:
            results = list(pool.map(worker, items, chunksize=8))
    else:
        results = [worker(it) for it in items]
    datapoints = [r for r in results if r is not None]

    # speaker conditioning for the aligner's reconstruction decoder
    for d in datapoints:
        if speaker_embedding_fn is not None:
            d["speaker_embedding"] = np.asarray(speaker_embedding_fn(d["mel"]),
                                                np.float32)
        else:
            d["speaker_embedding"] = np.zeros(192, np.float32)

    save_cache(cache_path, datapoints)
    return datapoints


def save_cache(path: str, datapoints: list):
    flat = {}
    for i, d in enumerate(datapoints):
        for k, v in d.items():
            if isinstance(v, str):
                flat[f"{i}/{k}"] = np.asarray(v)
            else:
                flat[f"{i}/{k}"] = v
    flat["__len__"] = np.asarray(len(datapoints))
    np.savez_compressed(path, **flat)


def load_cache(path: str):
    loaded = np.load(path, allow_pickle=False)
    n = int(loaded["__len__"])
    datapoints = []
    for i in range(n):
        d = {}
        for key in loaded.files:
            if key.startswith(f"{i}/"):
                k = key.split("/", 1)[1]
                v = loaded[key]
                d[k] = str(v) if v.dtype.kind in "US" else v
        datapoints.append(d)
    return datapoints


def build_fastspeech_cache(aligner_datapoints: list, aligner_variables,
                           cache_dir: str, lang: str, ctc_selection: bool = True,
                           rebuild_cache: bool = False):
    """Augment the aligner cache with durations/energy/pitch + CTC filter."""
    import jax.numpy as jnp
    from toucan_tpu.data.extraction import extract_prosody
    from toucan_tpu.data.scorer import ctc_outlier_filter
    from toucan_tpu.models.aligner import Aligner, alignment_from_logits, ctc_loss

    os.makedirs(cache_dir, exist_ok=True)
    cache_path = os.path.join(cache_dir, "fast_train_cache.npz")
    if os.path.exists(cache_path) and not rebuild_cache:
        return load_cache(cache_path)

    aligner = Aligner()
    f2i = feature_index()
    lang_id = language_id(lang)
    out, ctc_scores = [], []
    for d in aligner_datapoints:
        text = np.asarray(d["text"])
        keep = text[:, f2i["word-boundary"]] == 0
        boundary_indices = list(np.flatnonzero(~keep))
        token_ids = vectors_to_ctc_ids(text)
        mel = np.asarray(d["mel"], np.float32)
        logits = np.asarray(aligner.apply(aligner_variables, jnp.asarray(mel[None])))[0]
        loss = float(ctc_loss(jnp.asarray(logits[None]), jnp.asarray([len(mel)]),
                              jnp.asarray([token_ids]), jnp.asarray([len(token_ids)])))
        alignment = alignment_from_logits(logits, token_ids)
        durations, energy, pitch = extract_prosody(
            np.asarray(d["wave"]), alignment, text, boundary_indices,
            n_frames=mel.shape[0])
        out.append(dict(text=text, mel=mel, durations=durations.astype(np.int32),
                        energy=energy.astype(np.float32),
                        pitch=pitch.astype(np.float32), lang_id=lang_id,
                        path=d.get("path", "")))
        ctc_scores.append(loss)

    if ctc_selection:
        out = ctc_outlier_filter(out, ctc_scores)
    save_cache(cache_path, out)
    return out


def prepare_fastspeech_corpus(path_to_transcript: dict, corpus_dir: str, lang: str,
                              aligner_variables=None, fine_tune_aligner=True,
                              aligner_train_fn=None, use_g2p: bool = True,
                              ctc_selection: bool = True, **cache_kwargs):
    """Full orchestration (``corpus_preparation.py:17-73``): aligner cache ->
    optional aligner fine-tune on this corpus -> TTS cache."""
    aligner_data = build_aligner_cache(path_to_transcript, corpus_dir, lang,
                                       use_g2p=use_g2p, **cache_kwargs)
    if fine_tune_aligner and aligner_train_fn is not None:
        # steps heuristic: len(dataset) steps, like corpus_preparation.py:45-47
        aligner_variables = aligner_train_fn(aligner_data,
                                             steps=max(len(aligner_data), 1))
    assert aligner_variables is not None, "need aligner weights or a train fn"
    return build_fastspeech_cache(aligner_data, aligner_variables, corpus_dir,
                                  lang, ctc_selection=ctc_selection)
