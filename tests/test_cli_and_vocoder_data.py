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
    """1:1 with the reference's pipeline_dict (run_training_pipeline.py:19-36)."""
    pipelines = build_pipeline_dict()
    reference_keys = {"nancy", "nancystoch", "meta", "fine_ex", "tt_it",
                      "fs_it", "aligner", "embedding", "avocodo", "bigvgan"}
    assert reference_keys <= set(pipelines)


def test_meta_pipeline_has_reference_language_groups():
    """The meta recipe builds the reference's 14 per-language groups over 33
    corpora (ToucanTTS_MetaCheckpoint.py:47-193), incl. cmn/vi/pt-br."""
    import inspect

    from toucan_tpu.data.corpus_recipes import recipe_language
    from toucan_tpu.recipes.pipelines import meta_pipeline

    src = inspect.getsource(meta_pipeline)
    # evaluate the literal groups list out of the source
    groups_src = src[src.index("groups = ["):]
    groups = eval(groups_src[len("groups = "):groups_src.index("]\n    return") + 1])
    assert len(groups) == 14
    langs = []
    n_corpora = 0
    for group in groups:
        group_langs = set()
        for spec in group:
            name, lang = (spec[0], spec[1]) if isinstance(spec, tuple) else (spec, None)
            group_langs.add(lang or recipe_language(name))
            n_corpora += 1
        assert len(group_langs) == 1, group
        langs.append(group_langs.pop())
    assert sorted(langs) == sorted(["en", "de", "el", "es", "fi", "ru", "hu",
                                    "nl", "fr", "pt-br", "pl", "it", "cmn",
                                    "vi"])
    # 7 en + 6 de + 1 el + 3 es + 1 fi + 1 ru + 1 hu + 2 nl + 5 fr
    # + 1 pt-br + 1 pl + 1 it + 2 cmn + 1 vi  (ToucanTTS_MetaCheckpoint.py)
    assert n_corpora == 33


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


def test_full_reference_recipe_coverage():
    """Every named recipe in the reference's path_to_transcript_dicts.py
    (``Utility/path_to_transcript_dicts.py``, 58 builders) has an accessor."""
    import toucan_tpu.data.corpus_recipes as cr

    reference_names = [
        "ESDS", "RAVDESS", "VIVOS_viet", "aishell3", "att_hack", "bernd",
        "blizzard2023_ad", "blizzard2023_ad_long",
        "blizzard2023_ad_long_silence_removed",
        "blizzard2023_ad_silence_removed", "blizzard2023_neb",
        "blizzard2023_neb_e", "blizzard2023_neb_e_silence_removed",
        "blizzard2023_neb_long", "blizzard2023_neb_long_silence_removed",
        "blizzard2023_neb_silence_removed", "blizzard2023_neb_tiny_test",
        "blizzard_2013", "css10cmn", "css10de", "css10el", "css10es",
        "css10fi", "css10fr", "css10hu", "css10nl", "css10ru", "elizabeth",
        "eva", "fluxsing", "friedrich", "hokus", "hokuspokus", "hui_others",
        "hui_template", "integration_test", "karlsson", "libritts",
        "libritts_all_clean", "libritts_other500", "ljspeech", "mls_dutch",
        "mls_french", "mls_italian", "mls_polish", "mls_portuguese",
        "mls_spanish", "multi_ling_librispeech_template", "nancy",
        "nvidia_hifitts", "siwis_subset", "spanish_blizzard_train",
        "synpaflex_all", "synpaflex_norm_subset", "thorsten",
        "thorsten_2020", "vctk", "vietTTS",
    ]
    assert len(reference_names) == 58
    for name in reference_names:
        fn = getattr(cr, f"build_path_to_transcript_dict_{name}")
        assert callable(fn), name


def test_emotion_and_vivos_templates(tmp_path):
    import toucan_tpu.data.corpus_recipes as cr

    # RAVDESS: sentence choice from filename field 5
    rav = tmp_path / "RAVDESS" / "Actor_01"
    rav.mkdir(parents=True)
    (rav / "03-01-01-01-01-01-01.wav").write_bytes(b"RIFF")
    (rav / "03-01-01-01-02-01-01.wav").write_bytes(b"RIFF")
    d = cr.ravdess(str(tmp_path / "RAVDESS"))
    assert set(d.values()) == {"Kids are talking by the door.",
                               "Dogs are sitting by the door."}

    # ESDS: speakers >10, tab-separated transcript with emotion subdirs
    spk = tmp_path / "ESDS" / "0011"
    (spk / "Neutral").mkdir(parents=True)
    (spk / "fixed_unicode.txt").write_text("x_000351\tthe text\tNeutral\n")
    d = cr.esds(str(tmp_path / "ESDS"))
    assert d == {str(spk / "Neutral" / "0011_000351.wav"): "the text"}

    # VIVOS: prompts.txt ids map into waves/<spk>/
    viv = tmp_path / "vivos"
    viv.mkdir()
    (viv / "prompts.txt").write_text("VIVOSSPK01_R001 XIN CHAO\n")
    d = cr.vivos(str(viv))
    assert d == {str(viv / "waves" / "VIVOSSPK01" / "VIVOSSPK01_R001.wav"):
                 "xin chao"}


def test_run_scripts_importable():
    """Every reference run_*.py entry point has an importable equivalent
    (main-guarded; optional deps like gradio must not break import)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = [f for f in os.listdir(root)
               if f.startswith("run_") and f.endswith(".py")]
    assert len(scripts) >= 8, scripts
    for fname in scripts:
        spec = importlib.util.spec_from_file_location(
            fname[:-3], os.path.join(root, fname))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # must not raise


def test_tt_it_pipeline_end_to_end(tmp_path, monkeypatch):
    """The `tt_it` integration recipe end-to-end through the recipe layer:
    corpus recipe (LJSpeech-style metadata.csv) -> aligner cache + fine-tune
    -> MAS durations/pitch/energy -> train loop -> checkpoint on disk.
    Uses IPA transcripts + use_g2p=False (no espeak in the image) and a tiny
    model config for CPU runtime."""
    import wave as wave_mod

    import numpy as np

    corpus = tmp_path / "corpora" / "NancyKrebs"
    (corpus / "wav").mkdir(parents=True)
    ipa = ["~ðɪs ɪz ə tˈɛst~#", "~hɛlˈoʊ wˈɜːld~#", "~ə ʃˈɔːt sˈɛntəns~#"]
    lines = []
    sr = 16000
    for i, text in enumerate(ipa):
        t = np.arange(int(sr * (1.3 + 0.2 * i))) / sr
        sig = 0.5 * np.sin(2 * np.pi * (150 + 30 * i) * t)
        pcm = (sig * 32767).astype(np.int16)
        with wave_mod.open(str(corpus / "wav" / f"utt{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        lines.append(f"utt{i}|{text}")
    (corpus / "metadata.csv").write_text("\n".join(lines), encoding="utf8")

    monkeypatch.setenv("TOUCAN_CORPORA_ROOT", str(tmp_path / "corpora"))
    monkeypatch.chdir(tmp_path)

    from tests.test_train_dist import TINY
    from toucan_tpu.recipes.pipelines import integration_test_pipeline

    state, history = integration_test_pipeline(
        steps=2, batch_size=2, warmup_steps=1, postnet_start_steps=0,
        use_discriminator=False, use_g2p=False, config=TINY,
        model_dir=str(tmp_path / "model"))
    assert len(history) > 0
    assert np.isfinite(history[-1]["total_loss"])
    import os
    assert any(f.startswith("checkpoint") or f.endswith(".msgpack")
               for f in os.listdir(tmp_path / "model"))


def test_fs_it_pipeline_end_to_end(tmp_path, monkeypatch):
    """The `fs_it` embedding-function integration recipe end-to-end: corpus
    prep -> FastSpeech2 + GST co-training -> embedding_function.msgpack on
    disk (FastSpeech2Embedding_IntegrationTest.py:44-57)."""
    import wave as wave_mod

    import numpy as np

    corpus = tmp_path / "corpora" / "NancyKrebs"
    (corpus / "wav").mkdir(parents=True)
    ipa = ["~ðɪs ɪz ə tˈɛst~#", "~hɛlˈoʊ wˈɜːld~#"]
    lines = []
    sr = 16000
    for i, text in enumerate(ipa):
        t = np.arange(int(sr * (1.3 + 0.2 * i))) / sr
        sig = 0.5 * np.sin(2 * np.pi * (150 + 30 * i) * t)
        pcm = (sig * 32767).astype(np.int16)
        with wave_mod.open(str(corpus / "wav" / f"utt{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        lines.append(f"utt{i}|{text}")
    (corpus / "metadata.csv").write_text("\n".join(lines), encoding="utf8")

    monkeypatch.setenv("TOUCAN_CORPORA_ROOT", str(tmp_path / "corpora"))
    monkeypatch.chdir(tmp_path)

    from tests.test_train_dist import TINY
    from toucan_tpu.recipes.pipelines import (
        fs_embedding_integration_test_pipeline)

    gst_vars = fs_embedding_integration_test_pipeline(
        steps=2, batch_size=2, warmup_steps=1, use_g2p=False, config=TINY,
        model_dir=str(tmp_path / "model"))
    assert "params" in gst_vars
    assert os.path.exists(tmp_path / "model" / "embedding_function.msgpack")
