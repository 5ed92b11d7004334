import numpy as np

from toucan_tpu.data.silence_removal import (
    find_illegal_silences,
    remove_illegal_silences,
)
from toucan_tpu.frontend.inventory import feature_index
from toucan_tpu.frontend.multilinguality import SimilaritySolver, iso_to_fullname


def test_similarity_solver():
    solver = SimilaritySolver()
    names = iso_to_fullname()
    assert "deu" in names and "eng" in names
    assert all("Sign Language" not in v for v in names.values())
    # German and Dutch are family-close; both germanic
    close = solver.find_closest_in_family("deu", ["nld", "fra", "cmn", "vie"],
                                          n_closest=2)
    assert close and close[0] == "nld"
    # map distance puts Dutch nearer to German than Vietnamese
    d_nld = solver.map_dist("deu", "nld")
    d_vie = solver.map_dist("deu", "vie")
    assert abs(d_nld) < abs(d_vie)


def test_illegal_silence_removal():
    sr, hop = 16000, 256
    f2i = feature_index()
    # 3 phones: speechy phone, speechy phone, silence phone
    text = np.zeros((3, 62), np.float32)
    text[0, f2i["phoneme"]] = 1
    text[1, f2i["phoneme"]] = 1
    text[2, f2i["silence"]] = 1
    # phone 0: 0.5 s of tone, phone 1: 0.5 s where the middle 0.3 s is SILENT
    # (illegal), phone 2: 0.3 s legal silence
    tone = 0.5 * np.sin(2 * np.pi * 200 * np.arange(8000) / sr)
    seg2 = np.concatenate([tone[:1600], np.zeros(4800), tone[:1600]])
    wave = np.concatenate([tone, seg2, np.zeros(4800)]).astype(np.float32)
    durations = np.array([8000 // hop, 8000 // hop, 4800 // hop], np.int64)

    spans = find_illegal_silences(wave, text, durations)
    assert len(spans) == 1
    s0, s1 = spans[0]
    assert 8000 < s0 < s1 < 16000  # inside phone 1

    cleaned = remove_illegal_silences(dict(wave=wave, text=text,
                                           durations=durations))
    assert len(cleaned["wave"]) < len(wave)
    assert cleaned["durations"][1] < durations[1]
    assert cleaned["durations"][0] == durations[0]
