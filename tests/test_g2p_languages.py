"""G2P-path coverage for all 17 supported languages.

espeak-ng isn't installed in CI, so these tests inject a fake
``phonemizer.backend.EspeakBackend`` (and pypinyin/dragonmapper for
Mandarin) to exercise the full text -> expansion -> G2P -> IPA
normalization -> feature-vector path the reference smoke-tests in
``TextFrontend.py:527-546``.
"""

import sys
import types

import numpy as np
import pytest

from toucan_tpu.frontend.inventory import feature_index
from toucan_tpu.frontend.text import (
    SUPPORTED_LANGUAGES,
    TextFrontend,
    language_id,
)

# plausible espeak-style IPA (with stress marks) per voice; the exact
# segments don't matter, only that they flow through the full pipeline
_FAKE_IPA = {
    "en-us": "ðɪs ɪz ɐ kˈɑːmplɛks sˈɛntəns, ɪt ˈiːvən hɐz ɐ pˈɔːz!",
    "de": "diːs ɪst aɪn komplˈɛksɐ zˈats, eːɐ hat zoːɡˈaːɐ ˈaɪnə pˈaʊzə!",
    "vi": "ɗʌɪ1 la2 mot6 kʌʊ1 fɯk5 tap6",
}
_DEFAULT_IPA = "ˈaβɣð ɛfɡh ˈidʒkl, mnˈopr!"


class _FakeEspeakBackend:
    instances = []

    def __init__(self, language, **kwargs):
        self.language = language
        self.kwargs = kwargs
        _FakeEspeakBackend.instances.append(self)

    def phonemize(self, texts, strip=True):
        self.last_input = texts
        return [_FAKE_IPA.get(self.language, _DEFAULT_IPA) for _ in texts]


@pytest.fixture
def fake_g2p(monkeypatch):
    _FakeEspeakBackend.instances = []
    backend_mod = types.ModuleType("phonemizer.backend")
    backend_mod.EspeakBackend = _FakeEspeakBackend
    pkg = types.ModuleType("phonemizer")
    pkg.backend = backend_mod
    monkeypatch.setitem(sys.modules, "phonemizer", pkg)
    monkeypatch.setitem(sys.modules, "phonemizer.backend", backend_mod)

    pypinyin = types.ModuleType("pypinyin")
    pypinyin.pinyin = lambda text: [["zhe4"], ["shi4"], ["ju4"], ["zi5"]]
    monkeypatch.setitem(sys.modules, "pypinyin", pypinyin)
    dm = types.ModuleType("dragonmapper")
    dm_tr = types.ModuleType("dragonmapper.transcriptions")
    dm_tr.pinyin_to_ipa = lambda text: "ʈʂɤ˥˩ ʂɨ˥˩ tɕy˥˩ tsɨ"
    dm.transcriptions = dm_tr
    monkeypatch.setitem(sys.modules, "dragonmapper", dm)
    monkeypatch.setitem(sys.modules, "dragonmapper.transcriptions", dm_tr)
    return _FakeEspeakBackend


@pytest.mark.parametrize("lang", sorted(SUPPORTED_LANGUAGES))
def test_g2p_path_per_language(fake_g2p, lang):
    fe = TextFrontend(language=lang)
    sentence = fe.get_example_sentence(lang) or "test sentence"
    feats = fe.string_to_features(sentence)
    assert feats.shape[1] == 62 and feats.shape[0] > 3
    # pipeline invariants: leading silence, trailing silence + eos
    f2i = feature_index()
    assert feats[0, f2i["silence"]] == 1
    assert feats[-1, f2i["end of sentence"]] == 1
    assert feats[-2, f2i["silence"]] == 1
    assert language_id(lang) >= 1
    if lang != "cmn":
        backend = fe._g2p
        assert backend.language == fe.g2p_lang
        assert backend.kwargs["with_stress"] is True


def test_english_abbreviation_expansion_feeds_g2p(fake_g2p):
    fe = TextFrontend(language="en")
    fe.string_to_features("Dr. Smith lives on St. James St.")
    sent = fe._g2p.last_input[0]
    assert "doctor" in sent and "saint" in sent and "Dr." not in sent


def test_french_spacing_removal_feeds_g2p(fake_g2p):
    fe = TextFrontend(language="fr")
    fe.string_to_features("C'est une phrase complexe , elle a même une pause !")
    sent = fe._g2p.last_input[0]
    assert " ," not in sent and " !" not in sent


def test_vietnamese_tone_numbers_become_contours(fake_g2p):
    fe = TextFrontend(language="vi")
    phones = fe.get_phone_string(fe.get_example_sentence("vi"),
                                 for_feature_extraction=True)
    assert not any(ch.isdigit() for ch in phones)
    feats = fe.string_to_features(fe.get_example_sentence("vi"))
    f2i = feature_index()
    tone_dims = [f2i[k] for k in ("very-high-tone", "high-tone", "mid-tone",
                                  "low-tone", "very-low-tone")]
    assert feats[:, tone_dims].sum() > 0


def test_mandarin_tone_contours(fake_g2p):
    fe = TextFrontend(language="cmn")
    feats = fe.string_to_features(fe.get_example_sentence("cmn"))
    f2i = feature_index()
    assert feats[:, f2i["falling-tone"]].sum() > 0  # 4th tone contour marks


def test_stress_marks_flag_following_phone(fake_g2p):
    fe = TextFrontend(language="en")
    feats = fe.string_to_features("This is a complex sentence!")
    f2i = feature_index()
    assert feats[:, f2i["stressed"]].sum() > 0
