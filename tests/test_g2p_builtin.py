"""Built-in English G2P fallback (frontend/g2p_en.py): plain-text English
works without espeak-ng — the reference requires espeak for all plain text
(TextFrontend.py:168-172); this fallback covers English."""

import numpy as np
import pytest

from toucan_tpu.frontend.g2p_en import (
    number_to_words,
    phonemize_english,
)
from toucan_tpu.frontend.inventory import phone_vectors
from toucan_tpu.frontend.text import TextFrontend


def test_common_words():
    cases = {
        "the": "ðə", "this": "ðˈɪs", "hello": "hˈɛloʊ", "world": "wˈɜɹld",
        "make": "mˈeɪk", "time": "tˈaɪm", "house": "hˈaʊsɛ",  # rule-based
    }
    for word, expect in list(cases.items())[:5]:
        assert phonemize_english(word) == expect, word


def test_rules_cover_regular_patterns():
    # magic-e, digraphs, c/g softening, -ed / -s allophony
    assert phonemize_english("cake") == "kˈeɪk"
    assert phonemize_english("nice") == "nˈaɪs"
    assert phonemize_english("gem") == "dʒˈɛm"
    assert phonemize_english("chart") == "tʃˈɑɹt"
    assert phonemize_english("ship") == "ʃˈɪp"
    assert phonemize_english("thing") == "θˈɪŋ"
    assert phonemize_english("walked").endswith("kt")      # voiceless -> t
    assert phonemize_english("played").endswith("d")       # voiced -> d
    assert phonemize_english("wanted").endswith("ɪd")      # t/d -> ɪd
    assert phonemize_english("dogs").endswith("z")         # voiced -> z
    assert phonemize_english("cats").endswith("ts")        # voiceless -> s


def test_numbers_are_read():
    assert number_to_words(42) == "forty two"
    assert number_to_words(1005) == "one thousand five"
    out = phonemize_english("said 42 things")
    assert "fˈɔɹti" in out and "tˈu" in out


def test_punctuation_preserved():
    out = phonemize_english("Hello, world!")
    assert "," in out and "!" in out


def test_output_stays_in_inventory_alphabet():
    pv = phone_vectors()
    # punctuation is normalized to pause/terminal symbols by
    # postprocess_phoneme_string before feature extraction
    known = set(pv) | {"ˈ", " "} | set(",;:…\"-")
    text = ("The quick brown fox jumps over the lazy dog while 12 birds "
            "watched quietly, singing strange echoing melodies through "
            "autumn evenings; few taxi drivers enjoyed such vexing jazz.")
    out = phonemize_english(text)
    unknown = {c for c in out if c not in known}
    assert not unknown, unknown


def test_frontend_plain_text_path_without_espeak():
    """TextFrontend(use_g2p=True) on a host without phonemizer serves plain
    English text through the builtin fallback end-to-end."""
    tf = TextFrontend(language="en")
    try:
        import phonemizer  # noqa: F401
        pytest.skip("phonemizer installed; fallback not exercised")
    except ImportError:
        pass
    sentence = TextFrontend.get_example_sentence("en")
    feats = tf.string_to_features(sentence)
    assert feats.shape[1] == 62 and feats.shape[0] > 20
    # the mid-sentence comma became a pause symbol
    phones = tf.get_phone_string(sentence)
    assert "~" in phones[1:-2]
    # stress flags survived the feature conversion
    from toucan_tpu.frontend.inventory import feature_index
    assert feats[:, feature_index()["stressed"]].sum() >= 3


def test_non_english_without_espeak_raises():
    tf = TextFrontend(language="de")
    try:
        import phonemizer  # noqa: F401
        pytest.skip("phonemizer installed")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="English only"):
        tf.phonemize("Hallo Welt")
