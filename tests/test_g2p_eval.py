"""G2P accuracy floor against the curated dictionary-IPA fixture
(VERDICT r03 #6: quantify G2P quality; numbers recorded in G2P.md)."""

from toucan_tpu.frontend.g2p_eval import evaluate

# measured round-4 levels (G2P.md); a regression below these fails
MIN_WORD_ACC = {
    "en": 1.0, "es": 1.0, "de": 1.0, "fr": 1.0, "fi": 1.0, "hu": 1.0,
    "el": 1.0, "ru": 1.0, "uk": 1.0, "fa": 1.0, "vi": 1.0,
    "cmn": 1.0,
    "it": 1.0, "nl": 1.0, "pl": 1.0, "pt": 1.0, "pt-br": 1.0,
}
MAX_PER = 0.03


def test_g2p_accuracy_floors():
    results = evaluate()
    assert set(MIN_WORD_ACC) == set(results), "fixture/language drift"
    problems = []
    for lang, r in results.items():
        if r["word_accuracy"] < MIN_WORD_ACC[lang]:
            problems.append(
                f"{lang}: word-acc {r['word_accuracy']:.1%} < "
                f"{MIN_WORD_ACC[lang]:.1%}: {r['errors'][:5]}")
        if r["per"] > MAX_PER:
            problems.append(f"{lang}: PER {r['per']:.1%} > {MAX_PER:.1%}")
    assert not problems, "\n".join(problems)


def test_residual_errors_are_the_documented_ones():
    """End of round 4 the whole 400-word fixture passes (the lexical
    it/pt open-vowel class is lexicon-covered for common words); any new
    error shows up here by name."""
    results = evaluate()
    residual = {(lang, w) for lang, r in results.items()
                for (w, _, _) in r["errors"]}
    assert residual == set(), residual


def _stress_coverage(lang, path, vowels):
    from toucan_tpu.frontend.g2p_rules import phonemize_rules

    import os
    words, seen = [], set()
    with open(os.path.join(os.path.dirname(__file__), "data", path),
              encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            for w in line.split():
                if w not in seen:
                    seen.add(w)
                    words.append(w)
    poly = [w for w in words if sum(c in vowels for c in w) >= 2]
    missing = [w for w in poly if "ˈ" not in phonemize_rules(w, lang)]
    return len(poly), missing


def test_ru_stress_coverage_top500():
    """VERDICT r04 #7: every polysyllabic top-500 Russian word form must
    carry stress in phonemize output (stress gates akanye reduction, so an
    unstressed word is ALSO unreduced — doubly wrong).  Lexicon + suffix
    heuristics (-ой/-ение/-ость/-ировать classes)."""
    n, missing = _stress_coverage("ru", "ru_top500.txt", set("аеёиоуыэюя"))
    assert n >= 400
    assert not missing, missing[:20]


def test_uk_stress_coverage_top500():
    n, missing = _stress_coverage("uk", "uk_top500.txt", set("аеєиіїоуюя"))
    assert n >= 400
    assert not missing, missing[:20]
