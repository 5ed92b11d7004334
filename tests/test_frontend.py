import numpy as np
import pytest

from tests.conftest import import_reference_module, reference_available
from toucan_tpu.frontend import (
    CTC_BLANK_ID,
    NUM_CTC_SYMBOLS,
    NUM_FEATURES,
    TextFrontend,
    feature_index,
    language_id,
    phone_ids,
    phone_vectors,
)

# IPA strings exercising stress, length, tones (register + contour), nasality,
# silence/punctuation symbols, and word boundaries.
IPA_SAMPLES = [
    "~ðɪs ɪz ə tˈɛst~#",
    "~ˈaː bˑc̆ d̃~#",
    "~ma˥ma˩ ma˧ma˥~#",
    "~a⭧b⭨c⮁d⮃e~#",
    "~helˈoʊ wˈɜːld!~#",
    "~ʈʂʰ ɕ y ɐ̃~#",
]


def test_inventory_shapes():
    vecs = phone_vectors()
    assert all(len(v) == NUM_FEATURES for v in vecs.values())
    ids = phone_ids()
    assert max(ids.values()) < NUM_CTC_SYMBOLS
    assert CTC_BLANK_ID == 144
    # lexical uniqueness: no two phones share the same lexical feature block
    lex = {tuple(v[13:]) for v in vecs.values()}
    assert len(lex) == len(vecs)


def test_feature_extraction_basic():
    fe = TextFrontend(language="en", use_g2p=False)
    feats = fe.phones_to_features("~ˈaː mb~#")
    f2i = feature_index()
    # rows: ~  a  <word-boundary>  m  b  ~  #   (modifiers fold into 'a')
    assert feats.shape == (7, NUM_FEATURES)
    a = feats[1]
    assert a[f2i["stressed"]] == 1 and a[f2i["lengthened"]] == 1
    assert a[f2i["vowel"]] == 1 and a[f2i["voiced"]] == 1
    assert feats[2][f2i["word-boundary"]] == 1
    m = feats[3]
    assert m[f2i["nasal"]] == 1 and m[f2i["stressed"]] == 0


def test_language_ids():
    assert language_id("en") == 12 and language_id("de") == 1 and language_id("pt-br") == 17


def test_ctc_id_conversion_drops_word_boundaries():
    fe = TextFrontend(language="en", use_g2p=False)
    feats = fe.string_to_features("~a b~#", input_phonemes=True)
    ids = fe.text_vectors_to_id_sequence(feats)
    p2id = phone_ids()
    assert ids == [p2id["~"], p2id["a"], p2id["b"], p2id["~"], p2id["#"]]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
class TestReferenceParity:
    @pytest.fixture(scope="class")
    def ref_frontend(self):
        mod = import_reference_module("Preprocessing.TextFrontend")
        # "cmn" skips the espeak backend construction entirely
        return mod.ArticulatoryCombinedTextFrontend(language="cmn")

    @pytest.fixture(scope="class")
    def our_frontend(self):
        return TextFrontend(language="cmn", use_g2p=False)

    @pytest.mark.parametrize("raw", [
        "həˈloʊ wˈɜːld, hˑaʊ ɑː˥˩ jˈuː? ma˧˥ la˥˨˧...",
        'a "b" c; d: e — f/g',
        "ma˥ma˩˥ma˧˨˧  duː̃",
        "t̪ h̥ x͡x unsupported ʰmarks",
    ])
    def test_postprocess_parity(self, ref_frontend, our_frontend, raw):
        ours = our_frontend.postprocess_phoneme_string(raw, True, True, False)
        theirs = ref_frontend.postprocess_phoneme_string(raw, True, True, False)
        assert ours == theirs

    @pytest.mark.parametrize("ipa", IPA_SAMPLES)
    def test_feature_vector_parity(self, ref_frontend, our_frontend, ipa):
        theirs = ref_frontend.string_to_tensor(ipa, input_phonemes=True).numpy()
        ours = our_frontend.string_to_features(ipa, input_phonemes=True)
        np.testing.assert_array_equal(ours, theirs)

    @pytest.mark.parametrize("ipa", IPA_SAMPLES)
    def test_ctc_ids_parity(self, ref_frontend, our_frontend, ipa):
        import torch
        feats = torch.tensor(our_frontend.string_to_features(ipa, input_phonemes=True))
        theirs = ref_frontend.text_vectors_to_id_sequence(feats)
        ours = our_frontend.text_vectors_to_id_sequence(feats.numpy())
        assert ours == theirs
