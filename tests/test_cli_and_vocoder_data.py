import os
import wave as wave_mod

import numpy as np
import pytest

from toucan_tpu.cli import build_pipeline_dict
from toucan_tpu.data.corpus_recipes import (
    available_recipes,
    build_path_to_transcript_dict,
    metadata_csv,
    recipe_language,
)
from toucan_tpu.data.vocoder_data import FRAMES, SEGMENT_24K, VocoderDataset


def test_pipeline_dict_covers_reference_recipes():
    pipelines = build_pipeline_dict()
    for key in ["nancy", "nancystoch", "meta", "fine_ex", "tt_it", "aligner",
                "embedding", "avocodo", "bigvgan"]:
        assert key in pipelines


def test_recipe_registry():
    names = available_recipes()
    assert "nancy" in names and "mls_french" in names and "css10ru" in names
    assert recipe_language("nancy") == "en"
    assert recipe_language("thorsten") == "de"
    assert recipe_language("mls_portuguese") == "pt"


def test_metadata_csv_template(tmp_path):
    root = tmp_path / "corpus"
    (root / "wav").mkdir(parents=True)
    for i in range(3):
        (root / "wav" / f"utt{i}.wav").write_bytes(b"RIFF")
    (root / "metadata.csv").write_text(
        "utt0|hello there\nutt1|second line\nutt2|third one\nmissing|nope\n")
    d = metadata_csv(str(root))
    assert len(d) == 3
    assert d[str(root / "wav" / "utt0.wav")] == "hello there"


def _write_wav(path, seconds, sr):
    t = np.arange(int(sr * seconds)) / sr
    sig = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    pcm = (sig * 32767).astype(np.int16)
    with wave_mod.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def test_vocoder_dataset(tmp_path):
    paths = []
    for i in range(2):
        p = tmp_path / f"v{i}.wav"
        _write_wav(p, seconds=1.5, sr=24000)
        paths.append(str(p))
    ds = VocoderDataset(paths, seed=0)
    batch = ds.sample_batch(3)
    assert batch["gold_wave"].shape == (3, SEGMENT_24K, 1)
    assert batch["mel"].shape == (3, FRAMES, 80)
    assert np.isfinite(batch["mel"]).all()
