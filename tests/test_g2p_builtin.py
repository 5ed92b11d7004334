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
        "make": "mˈeɪk", "time": "tˈaɪm", "house": "hˈaʊs",
        "nation": "nˈeɪʃən", "mouse": "mˈaʊs", "case": "kˈeɪs",
    }
    for word, expect in cases.items():
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
        from toucan_tpu.utils.optional import optional_import
        optional_import("phonemizer")  # stub-marked modules don't count
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


def test_every_supported_language_phonemizes_plain_text():
    """Post-round-4 contract: EVERY id in the language table serves plain
    text first-party — en (g2p_en), the 15 rule/transducer languages
    (g2p_rules, incl. uk + fa), and cmn (g2p_cmn) — so no supported
    language dead-ends without espeak (VERDICT r03 missing #2)."""
    from toucan_tpu.frontend.text import SUPPORTED_LANGUAGES

    plain = {
        "cmn": "ni3 hao3 shi4 jie4",  # numbered pinyin is plain text input
    }
    for lang in SUPPORTED_LANGUAGES:
        tf = TextFrontend(language=lang)
        text = plain.get(lang) or TextFrontend.get_example_sentence(lang) \
            or "abc"
        feats = tf.string_to_features(text)
        assert feats.shape[1] == 62 and feats.shape[0] > 3, lang


def test_stub_leak_regression_mandarin_after_reference_import():
    """compat/reference_import installs a fake ``pypinyin`` into
    sys.modules for parity checks; the frontend must NOT mistake it for a
    real install (round-3 suite failure: the stub silently hijacked the
    first-party Mandarin path in any process that ran a parity test
    first)."""
    pytest.importorskip("torch")
    from toucan_tpu.compat.reference_import import (import_reference_module,
                                                    reference_available)

    if not reference_available():
        pytest.skip("reference tree not mounted")
    import_reference_module("Utility.utils")  # installs the stubs
    import sys
    assert "pypinyin" in sys.modules  # the hazard is active
    tf = TextFrontend(language="cmn")
    phones = tf.phonemize("这 是")  # hanzi path: needs real pinyin reading
    assert "这" not in phones  # stub would echo the hanzi through
    feats = tf.string_to_features("这 是")
    assert feats.shape[0] > 2


def test_english_normalization_ordinals_times_acronyms():
    """espeak-style text normalization the reference gets for free through
    espeak (``Preprocessing/TextFrontend.py:298``): digit ordinals, clock
    times, all-caps acronyms, dotted abbreviations, decades."""
    tf = TextFrontend(language="en")
    cases = {
        "3rd": "θɜɹd",                       # not "three-rd" mashed
        "21st": "twɛnti fɜɹst",
        "the 5th": "fɪfθ",
        "3:30 pm": "θɹi θɜɹti pi ɛm",
        "9:05": "naɪn oʊ faɪv",
        "12:00": "twɛlv əklɑk",
        "TV": "ti vi",                        # all-caps -> letter names
        "USA": "ju ɛs eɪ",
        "NASA": "næsə",                       # known pronounceable acronym
        "e.g.": "i dʒi",                      # dotted abbreviation
        "etc.": "ɛt sɛtəɹə",
        "Mrs. Jones": "mɪsɪz",               # was "maɪzs" (magic-e misfire)
        "No. 7": "nʌmbəɹ sɛvən",
        "the 1980s": "naɪntin eɪtiz",
    }
    for text, expect in cases.items():
        got = tf.get_phone_string(text)
        assert expect in got, f"{text!r}: {got!r} missing {expect!r}"


def test_english_number_words_ipa():
    """The number words the letter-to-sound rules used to mangle now carry
    dictionary IPA (nineteen/ninety/minus/hundred/thousand/million)."""
    from toucan_tpu.frontend.g2p_en import _word_to_ipa

    gold = {
        "nineteen": "nˈaɪntin", "ninety": "nˈaɪnti", "ninth": "nˈaɪnθ",
        "seven": "sˈɛvən", "eleven": "ɪlˈɛvən", "minus": "mˈaɪnəs",
        "hundred": "hˈʌndɹəd", "thousand": "θˈaʊzənd",
        "million": "mˈɪljən", "billion": "bˈɪljən",
    }
    for word, ipa in gold.items():
        assert _word_to_ipa(word) == ipa, word


def test_english_ordinal_words():
    from toucan_tpu.frontend.g2p_en import number_to_ordinal_words

    assert number_to_ordinal_words(1) == "first"
    assert number_to_ordinal_words(12) == "twelfth"
    assert number_to_ordinal_words(21) == "twenty first"
    assert number_to_ordinal_words(30) == "thirtieth"
    assert number_to_ordinal_words(100) == "one hundredth"
    assert number_to_ordinal_words(1000) == "one thousandth"


def test_english_units_fractions_ranges_years_roman():
    """Late round-4 normalization: measurement units after numerals,
    simple fractions, digit ranges, year-style four-digit reading after a
    year-selecting word, and Roman numerals after a capitalized word
    (espeak-covered inputs, reference TextFrontend.py:298)."""
    from toucan_tpu.frontend.g2p_en import phonemize_english as g

    assert "kəlˈɑmətəɹz" in g("5 km away")
    assert "kəlˈɑmətəɹ " in g("1 km only")          # singular for 1
    assert "ɡˈɪɡəhɜɹts" in g("2.4 GHz")
    assert "mˈaɪlz pˈəɹ ˈaʊəɹ" in g("60 mph")
    assert "km" not in g("5 km")                     # nothing raw leaks
    # fractions: half/thirds/quarters by name, others as "over"
    assert "θɹˈi kwˈɑɹtɜɹz" in g("3/4 of them")
    assert "hˈæf" in g("1/2 cup")
    assert "ˈoʊvəɹ" in g("2/5 done")
    # ranges read as "to"
    assert "tˈu tu θɹˈi" in g("2-3 weeks")
    # years: two-pair style in year contexts, cardinal elsewhere
    assert "nˈaɪntin ˈeɪti fˈɔɹ" in g("in 1984")
    assert "twˈɛnti twˈɛnti fˈaɪv" in g("the year 2025")
    assert "θˈaʊzənd sˈɛvən" in g("in 2007")
    assert "ˈoʊ sˈɪks" in g("since 1906")
    assert "θˈaʊzənd" in g("1984 things")            # no context word
    # Roman numerals after a capitalized word; lone I stays the pronoun
    assert "tˈu" in g("World War II")
    assert "ˈeɪt" in g("Henry VIII")
    assert "fˈɔɹ" in g("Chapter IV")
    assert g("World War I").endswith("aɪ")


def test_english_normalization_advice_r04_fixes():
    """ADVICE r04: range reading must not mangle dates/phone numbers,
    single-letter Roman numerals need a numbering head word, and bare
    'of' is not a year context."""
    from toucan_tpu.frontend.g2p_en import _normalize_english as norm

    # 3+-part hyphen chains are NOT ranges (ISO dates, phone numbers)
    assert norm("2024-01-15") == "2024-01-15"
    assert norm("555-867-5309") == "555-867-5309"
    # two-part pairs must be range-shaped: left < right, equal width for
    # 3+-digit numbers
    assert norm("555-1234") == "555-1234"
    assert "to" in norm("2-3 weeks")
    assert "to" in norm("1914-1918")
    assert "to" in norm("5-10 days")
    # single-letter Roman numerals only after a numbering head
    assert norm("Malcolm X") == "Malcolm X"
    assert norm("Henry V") == "Henry five"
    assert norm("Louis X") == "Louis ten"
    assert "two" in norm("World War II")
    # bare "of" no longer triggers year reading; season-of does
    assert "1984" in norm("a total of 1984 items")
    assert "nineteen sixty nine" in norm("the summer of 1969")
