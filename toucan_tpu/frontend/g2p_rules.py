"""First-party rule-based G2P for the non-English languages.

The reference phonemizes plain text through espeak-ng
(``Preprocessing/TextFrontend.py:168-172``); espeak-ng cannot exist in this
image (no egress, no source tree, no binary), so these transducers make the
plain-text path REAL instead of mock-only for the languages whose
orthography is regular enough for rules: es, it, fi, el, hu, pl, nl, de,
ru, pt/pt-br, fr, vi.  English has its own NRL-style ruleset + lexicon
(``frontend/g2p_en.py``); Mandarin goes through pypinyin + dragonmapper
like the reference.

Engine: per language an ordered longest-match list of contextual rewrite
rules applied by a left-to-right scanner over the grapheme string (contexts
look at the *original* graphemes, so rule outputs can never feed later
patterns), followed by a per-language stress assigner.  Output is IPA
restricted to the articulatory inventory (``frontend/inventory.py``) and
feeds the same ``postprocess_phoneme_string`` -> feature-vector path the
espeak output would.

Quality notes (documented approximations):
* ru: letter-to-sound with palatalization; unstressed-vowel reduction needs
  a stress lexicon and is approximated (no reduction, no stress mark).
* fr: rule systems reach ~90% on French; liaison is not modeled.
* pt: vowel reduction is not modeled; nasalization is.
* de: stress falls on the first syllable (common case); separable-prefix
  stress shifts are not modeled.
Numbers are read digit-by-digit (espeak reads full numerals).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Callable, Dict, List, Optional, Sequence, Tuple

PRIMARY_STRESS = "ˈ"

# IPA vowel characters (inventory subset) used for syllable-nucleus scans.
IPA_VOWELS = ("aeiouyæøœɛɔəɨɯʊɪʏʌɐɑɒãẽĩõũɐ̃"
              "ɜʉ")


@dataclass(frozen=True)
class Rule:
    """``src`` graphemes rewrite to ``ipa`` when the regexes ``pre`` (anchored
    at the end of the left context) and ``post`` (anchored at the start of
    the right context) both match the ORIGINAL grapheme string."""

    src: str
    ipa: str
    pre: str = ""
    post: str = ""


class RuleSet:
    def __init__(self, rules: Sequence[Rule]):
        # longest source first; original order breaks ties
        self.rules = sorted(rules, key=lambda r: -len(r.src))
        self._pre = {id(r): re.compile("(?:%s)$" % r.pre) if r.pre else None
                     for r in self.rules}
        self._post = {id(r): re.compile(r.post) if r.post else None
                      for r in self.rules}

    def apply(self, word: str) -> str:
        out = []
        i = 0
        n = len(word)
        while i < n:
            for r in self.rules:
                j = i + len(r.src)
                if word[i:j] != r.src:
                    continue
                pre = self._pre[id(r)]
                if pre is not None and not pre.search(word, 0, i):
                    continue
                post = self._post[id(r)]
                if post is not None and not post.match(word, j):
                    continue
                out.append(r.ipa)
                i = j
                break
            else:  # no rule: drop unknown grapheme
                i += 1
        return "".join(out)


def _vowel_runs(ipa: str) -> List[int]:
    """Start indices of the maximal vowel runs (syllable nuclei)."""
    runs = []
    prev_vowel = False
    for i, ch in enumerate(ipa):
        is_v = ch in IPA_VOWELS
        if is_v and not prev_vowel:
            runs.append(i)
        prev_vowel = is_v or (prev_vowel and ch in "ː̃")
    return runs


def _insert_stress(ipa: str, run_index: int) -> str:
    runs = _vowel_runs(ipa)
    if not runs:
        return ipa
    pos = runs[run_index] if -len(runs) <= run_index < len(runs) else runs[-1]
    return ipa[:pos] + PRIMARY_STRESS + ipa[pos:]


def stress_initial(word: str, ipa: str) -> str:
    return _insert_stress(ipa, 0)


def stress_penult(word: str, ipa: str) -> str:
    return _insert_stress(ipa, -2 if len(_vowel_runs(ipa)) >= 2 else -1)


def stress_final(word: str, ipa: str) -> str:
    return _insert_stress(ipa, -1)


def stress_french(word: str, ipa: str) -> str:
    """Final-syllable prominence, skipping a word-final schwa."""
    runs = _vowel_runs(ipa)
    if not runs:
        return ipa
    idx = -1
    if len(runs) >= 2 and ipa[runs[-1]] == "ə":
        idx = -2
    return _insert_stress(ipa, idx)


def stress_spanish(word: str, ipa: str) -> str:
    """Accented vowel if written; else penult when the word ends in a vowel
    or n/s, final otherwise (standard Spanish rule)."""
    if PRIMARY_STRESS in ipa:
        return ipa
    return stress_penult(word, ipa) if re.search(r"[aeiouns]$", word) \
        else stress_final(word, ipa)


def stress_portuguese(word: str, ipa: str) -> str:
    if PRIMARY_STRESS in ipa:
        return ipa
    return stress_penult(word, ipa) if re.search(r"[aeoms]$|am$|em$", word) \
        else stress_final(word, ipa)


def stress_italian(word: str, ipa: str) -> str:
    return ipa if PRIMARY_STRESS in ipa else stress_penult(word, ipa)


def stress_marked_only(word: str, ipa: str) -> str:
    return ipa


@dataclass
class Language:
    rules: RuleSet
    stress: Callable[[str, str], str]
    digits: Sequence[str]  # words for 0..9, read digit-by-digit


# ---------------------------------------------------------------------------
# Spanish (Castilian: c/z -> θ, ll -> ʎ, j/g+ei -> x)
# ---------------------------------------------------------------------------

_ES_RULES = [
    Rule("ch", "tʃ"), Rule("ll", "ʎ"), Rule("rr", "r"), Rule("qu", "k"),
    Rule("gue", "ɡe"), Rule("gui", "ɡi"), Rule("güe", "ɡwe"), Rule("güi", "ɡwi"),
    Rule("c", "θ", post="[eéií]"), Rule("c", "k"),
    Rule("g", "x", post="[eéií]"), Rule("g", "ɡ"),
    Rule("j", "x"), Rule("ñ", "ɲ"), Rule("z", "θ"), Rule("v", "b"),
    Rule("h", ""), Rule("x", "ks"), Rule("y", "i", post="$"), Rule("y", "ʝ"),
    Rule("r", "r", pre="^"), Rule("r", "ɾ"),
    Rule("b", "b"), Rule("d", "d"), Rule("f", "f"), Rule("k", "k"),
    Rule("l", "l"), Rule("m", "m"), Rule("n", "n"), Rule("p", "p"),
    Rule("s", "s"), Rule("t", "t"), Rule("w", "w"),
    # unaccented high vowels glide before vowels (diphthongs: ie -> je)
    Rule("i", "j", post="[aeouáéóú]"), Rule("u", "w", post="[aeioáéíó]"),
    Rule("a", "a"), Rule("e", "e"), Rule("i", "i"), Rule("o", "o"),
    Rule("u", "u"),
    Rule("á", "ˈa"), Rule("é", "ˈe"), Rule("í", "ˈi"), Rule("ó", "ˈo"),
    Rule("ú", "ˈu"), Rule("ü", "w"),
]

_ES_DIGITS = ["cero", "uno", "dos", "tres", "cuatro", "cinco", "seis",
              "siete", "ocho", "nueve"]

# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_RULES = [
    Rule("sci", "ʃ", post="[aou]"), Rule("sce", "ʃe"), Rule("sci", "ʃi"),
    Rule("sch", "sk"),
    Rule("gli", "ʎ", post="[aeou]"), Rule("gli", "ʎi"), Rule("gn", "ɲ"),
    Rule("chi", "ki"), Rule("che", "ke"), Rule("ch", "k"),
    Rule("ghi", "ɡi"), Rule("ghe", "ɡe"), Rule("gh", "ɡ"),
    Rule("ci", "tʃ", post="[aou]"), Rule("gi", "dʒ", post="[aou]"),
    Rule("c", "tʃ", post="[eèéi]"), Rule("c", "k"),
    Rule("g", "dʒ", post="[eèéi]"), Rule("g", "ɡ"),
    Rule("sb", "zb"), Rule("sd", "zd"), Rule("sg", "zɡ"), Rule("sl", "zl"),
    Rule("sm", "zm"), Rule("sn", "zn"), Rule("sr", "zr"), Rule("sv", "zv"),
    Rule("z", "ts"), Rule("h", ""), Rule("qu", "kw"),
    Rule("r", "r"), Rule("v", "v"),
    Rule("b", "b"), Rule("d", "d"), Rule("f", "f"), Rule("k", "k"),
    Rule("l", "l"), Rule("m", "m"), Rule("n", "ŋ", post="[ckgq]"),
    Rule("n", "n"), Rule("p", "p"), Rule("s", "s"), Rule("t", "t"),
    Rule("w", "w"), Rule("j", "j"), Rule("x", "ks"),
    Rule("a", "a"), Rule("e", "e"), Rule("i", "i"), Rule("o", "o"),
    Rule("u", "u"), Rule("y", "i"),
    Rule("à", "ˈa"), Rule("è", "ˈɛ"), Rule("é", "ˈe"), Rule("ì", "ˈi"),
    Rule("ò", "ˈɔ"), Rule("ó", "ˈo"), Rule("ù", "ˈu"),
]

_IT_DIGITS = ["zero", "uno", "due", "tre", "quattro", "cinque", "sei",
              "sette", "otto", "nove"]

# ---------------------------------------------------------------------------
# Finnish (close to 1:1; double letters = length)
# ---------------------------------------------------------------------------

_FI_RULES = [
    Rule("aa", "aː"), Rule("ee", "eː"), Rule("ii", "iː"), Rule("oo", "oː"),
    Rule("uu", "uː"), Rule("yy", "yː"), Rule("ää", "æː"), Rule("öö", "øː"),
    Rule("ng", "ŋː"), Rule("nk", "ŋk"),
    Rule("pp", "pː"), Rule("tt", "tː"), Rule("kk", "kː"), Rule("ss", "sː"),
    Rule("ll", "lː"), Rule("mm", "mː"), Rule("nn", "nː"), Rule("rr", "rː"),
    Rule("a", "a"), Rule("e", "e"), Rule("i", "i"), Rule("o", "o"),
    Rule("u", "u"), Rule("y", "y"), Rule("ä", "æ"), Rule("ö", "ø"),
    Rule("b", "b"), Rule("d", "d"), Rule("f", "f"), Rule("g", "ɡ"),
    Rule("h", "h"), Rule("j", "j"), Rule("k", "k"), Rule("l", "l"),
    Rule("m", "m"), Rule("n", "n"), Rule("p", "p"), Rule("r", "r"),
    Rule("s", "s"), Rule("t", "t"), Rule("v", "ʋ"), Rule("w", "ʋ"),
    Rule("c", "k"), Rule("z", "ts"), Rule("x", "ks"), Rule("å", "oː"),
]

_FI_DIGITS = ["nolla", "yksi", "kaksi", "kolme", "neljä", "viisi", "kuusi",
              "seitsemän", "kahdeksan", "yhdeksän"]

# ---------------------------------------------------------------------------
# Greek (modern; stress from tonos)
# ---------------------------------------------------------------------------

_EL_RULES = [
    # digraph vowels
    Rule("ου", "u"), Rule("ού", "ˈu"),
    Rule("αι", "e"), Rule("αί", "ˈe"), Rule("ει", "i"), Rule("εί", "ˈi"),
    Rule("οι", "i"), Rule("οί", "ˈi"), Rule("υι", "i"),
    # αυ/ευ: voiced before voiced/vowel, else f
    Rule("αυ", "av", post="[αβγδεζηλμνιορωυ]"), Rule("αυ", "af"),
    Rule("αύ", "ˈav", post="[αβγδεζηλμνιορωυ]"), Rule("αύ", "ˈaf"),
    Rule("ευ", "ev", post="[αβγδεζηλμνιορωυ]"), Rule("ευ", "ef"),
    Rule("εύ", "ˈev", post="[αβγδεζηλμνιορωυ]"), Rule("εύ", "ˈef"),
    # nasal+stop clusters
    Rule("μπ", "b", pre="^"), Rule("μπ", "mb"),
    Rule("ντ", "d", pre="^"), Rule("ντ", "nd"),
    Rule("γκ", "ɡ", pre="^"), Rule("γκ", "ŋɡ"), Rule("γγ", "ŋɡ"),
    Rule("τσ", "ts"), Rule("τζ", "dz"),
    # γ: j before front vowels, ɣ otherwise
    Rule("γ", "ʝ", post="[ειηυίέήύ]"), Rule("γ", "ɣ"),
    Rule("χ", "ç", post="[ειηυίέήύ]"), Rule("χ", "x"),
    Rule("α", "a"), Rule("ά", "ˈa"), Rule("ε", "e"), Rule("έ", "ˈe"),
    Rule("η", "i"), Rule("ή", "ˈi"), Rule("ι", "i"), Rule("ί", "ˈi"),
    Rule("ϊ", "i"), Rule("ΐ", "ˈi"), Rule("ο", "o"), Rule("ό", "ˈo"),
    Rule("υ", "i"), Rule("ύ", "ˈi"), Rule("ϋ", "i"), Rule("ΰ", "ˈi"),
    Rule("ω", "o"), Rule("ώ", "ˈo"),
    Rule("β", "v"), Rule("δ", "ð"), Rule("ζ", "z"), Rule("θ", "θ"),
    Rule("κ", "c", post="[ειηυίέήύ]"), Rule("κ", "k"),
    Rule("λ", "l"), Rule("μ", "m"), Rule("ν", "n"), Rule("ξ", "ks"),
    Rule("π", "p"), Rule("ρ", "ɾ"), Rule("σ", "s"), Rule("ς", "s"),
    Rule("τ", "t"), Rule("φ", "f"), Rule("ψ", "ps"),
]

_EL_DIGITS = ["μηδέν", "ένα", "δύο", "τρία", "τέσσερα", "πέντε", "έξι",
              "επτά", "οκτώ", "εννέα"]

# ---------------------------------------------------------------------------
# Hungarian (very regular; initial stress)
# ---------------------------------------------------------------------------

_HU_RULES = [
    Rule("ccs", "tʃː"), Rule("ssz", "sː"), Rule("zzs", "ʒː"),
    Rule("ggy", "ɟː"), Rule("tty", "cː"), Rule("nny", "ɲː"), Rule("lly", "jː"),
    Rule("dzs", "dʒ"),
    Rule("cs", "tʃ"), Rule("sz", "s"), Rule("zs", "ʒ"), Rule("gy", "ɟ"),
    Rule("ty", "c"), Rule("ny", "ɲ"), Rule("ly", "j"), Rule("dz", "dz"),
    Rule("tt", "tː"), Rule("kk", "kː"), Rule("pp", "pː"), Rule("ll", "lː"),
    Rule("nn", "nː"), Rule("mm", "mː"), Rule("rr", "rː"), Rule("zz", "zː"),
    Rule("ff", "fː"), Rule("bb", "bː"), Rule("dd", "dː"), Rule("gg", "ɡː"),
    Rule("s", "ʃ"), Rule("c", "ts"), Rule("z", "z"), Rule("j", "j"),
    Rule("a", "ɒ"), Rule("á", "aː"), Rule("e", "ɛ"), Rule("é", "eː"),
    Rule("i", "i"), Rule("í", "iː"), Rule("o", "o"), Rule("ó", "oː"),
    Rule("ö", "ø"), Rule("ő", "øː"), Rule("u", "u"), Rule("ú", "uː"),
    Rule("ü", "y"), Rule("ű", "yː"),
    Rule("b", "b"), Rule("d", "d"), Rule("f", "f"), Rule("g", "ɡ"),
    Rule("h", "h"), Rule("k", "k"), Rule("l", "l"), Rule("m", "m"),
    Rule("n", "ŋ", post="[kg]"), Rule("n", "n"), Rule("p", "p"),
    Rule("r", "r"), Rule("t", "t"), Rule("v", "v"), Rule("w", "v"),
    Rule("x", "ks"), Rule("y", "i"), Rule("q", "k"),
]

_HU_DIGITS = ["nulla", "egy", "kettő", "három", "négy", "öt", "hat", "hét",
              "nyolc", "kilenc"]

# ---------------------------------------------------------------------------
# Polish (ʂ-series merged to ʃ-series like the reference replacements)
# ---------------------------------------------------------------------------

_PL_RULES = [
    Rule("dzi", "dʑ", post="[aeouąęó]"), Rule("dzi", "dʑi"),
    Rule("dź", "dʑ"), Rule("dż", "dʒ"), Rule("dz", "dz"),
    Rule("ci", "tɕ", post="[aeouąęó]"), Rule("ci", "tɕi"),
    Rule("si", "ɕ", post="[aeouąęó]"), Rule("si", "ɕi"),
    Rule("zi", "ʑ", post="[aeouąęó]"), Rule("zi", "ʑi"),
    Rule("ni", "ɲ", post="[aeouąęó]"), Rule("ni", "ɲi"),
    Rule("sz", "ʃ"), Rule("cz", "tʃ"), Rule("rz", "ʃ", pre="[ptk]"),
    Rule("rz", "ʒ"), Rule("ch", "x"),
    Rule("ć", "tɕ"), Rule("ś", "ɕ"), Rule("ź", "ʑ"), Rule("ń", "ɲ"),
    Rule("ż", "ʒ"), Rule("ł", "w"), Rule("w", "v"),
    Rule("ą", "ɔ̃"), Rule("ę", "ɛ̃"), Rule("ó", "u"),
    Rule("a", "a"), Rule("e", "ɛ"), Rule("i", "i"), Rule("o", "ɔ"),
    Rule("u", "u"), Rule("y", "ɨ"),
    Rule("b", "b"), Rule("c", "ts"), Rule("d", "d"), Rule("f", "f"),
    Rule("g", "ɡ"), Rule("h", "x"), Rule("j", "j"), Rule("k", "k"),
    Rule("l", "l"), Rule("m", "m"), Rule("n", "n"), Rule("p", "p"),
    Rule("r", "r"), Rule("s", "s"), Rule("t", "t"), Rule("z", "z"),
]

_PL_DIGITS = ["zero", "jeden", "dwa", "trzy", "cztery", "pięć", "sześć",
              "siedem", "osiem", "dziewięć"]

# ---------------------------------------------------------------------------
# Dutch (approximation)
# ---------------------------------------------------------------------------

_NL_RULES = [
    Rule("sch", "sx", post="[aeiou]"), Rule("sch", "s"),  # final -sch = /s/
    Rule("ij", "ɛi"), Rule("ei", "ɛi"), Rule("ui", "œy"), Rule("ou", "ʌu"),
    Rule("au", "ʌu"), Rule("oe", "u"), Rule("eu", "ø"), Rule("ie", "i"),
    Rule("aa", "aː"), Rule("ee", "eː"), Rule("oo", "oː"), Rule("uu", "y"),
    Rule("ng", "ŋ"), Rule("nk", "ŋk"), Rule("ch", "x"),
    Rule("a", "ɑ"), Rule("e", "ə", post="[lnr]?$"), Rule("e", "ɛ"),
    Rule("i", "ɪ"), Rule("o", "ɔ"), Rule("u", "ʏ"), Rule("y", "i"),
    Rule("b", "b"), Rule("c", "s", post="[ei]"), Rule("c", "k"),
    Rule("d", "t", post="$"), Rule("d", "d"), Rule("f", "f"),
    Rule("g", "ɣ"), Rule("h", "ɦ"), Rule("j", "j"), Rule("k", "k"),
    Rule("l", "l"), Rule("m", "m"), Rule("n", "n"), Rule("p", "p"),
    Rule("q", "k"), Rule("r", "r"), Rule("s", "s"), Rule("t", "t"),
    Rule("v", "v"), Rule("w", "ʋ"), Rule("x", "ks"), Rule("z", "z"),
    Rule("é", "ˈeː"), Rule("è", "ˈɛ"), Rule("ë", "ə"), Rule("ï", "i"),
]

_NL_DIGITS = ["nul", "een", "twee", "drie", "vier", "vijf", "zes", "zeven",
              "acht", "negen"]

# ---------------------------------------------------------------------------
# German (approximation; initial stress)
# ---------------------------------------------------------------------------

_DE_RULES = [
    Rule("tsch", "tʃ"), Rule("dsch", "dʒ"), Rule("sch", "ʃ"),
    Rule("tion", "tsioːn"), Rule("chs", "ks"),
    Rule("ch", "x", pre="[aou]"), Rule("ch", "ç"),
    Rule("ck", "k"), Rule("tz", "ts"), Rule("ph", "f"), Rule("th", "t"),
    Rule("qu", "kv"),
    Rule("sp", "ʃp", pre="^"), Rule("st", "ʃt", pre="^"),
    Rule("ei", "aɪ"), Rule("ai", "aɪ"), Rule("eu", "ɔʏ"), Rule("äu", "ɔʏ"),
    Rule("au", "aʊ"), Rule("ie", "iː"), Rule("ee", "eː"), Rule("aa", "aː"),
    Rule("oo", "oː"), Rule("eh", "eː"), Rule("ah", "aː"), Rule("oh", "oː"),
    Rule("uh", "uː"), Rule("ih", "iː"), Rule("äh", "ɛː"), Rule("öh", "øː"),
    Rule("üh", "yː"),
    Rule("a", "a"), Rule("e", "ə", post="[lnr]?$"), Rule("e", "ɛ"),
    Rule("i", "ɪ"), Rule("o", "ɔ"), Rule("u", "ʊ"), Rule("ä", "ɛ"),
    Rule("ö", "œ"), Rule("ü", "ʏ"), Rule("y", "y"),
    Rule("b", "p", post="$"), Rule("b", "b"),
    Rule("d", "t", post="$"), Rule("d", "d"),
    Rule("g", "k", post="$"), Rule("g", "ɡ"),
    Rule("s", "z", post="[aeiouäöü]"), Rule("s", "s"),
    Rule("ß", "s"), Rule("v", "f"), Rule("w", "v"), Rule("z", "ts"),
    Rule("c", "k"), Rule("f", "f"), Rule("h", "h"), Rule("j", "j"),
    Rule("k", "k"), Rule("l", "l"), Rule("m", "m"),
    Rule("n", "ŋ", post="[kg]"), Rule("n", "n"), Rule("p", "p"),
    Rule("r", "ʁ"), Rule("t", "t"), Rule("x", "ks"),
]

_DE_DIGITS = ["null", "eins", "zwei", "drei", "vier", "fünf", "sechs",
              "sieben", "acht", "neun"]

# ---------------------------------------------------------------------------
# Russian (letter-to-sound; stress unknown -> unreduced, unmarked)
# ---------------------------------------------------------------------------

_RU_SOFT = "еёюяьи"

_RU_RULES = [
    # iotated vowels: j+V word-initially / after vowels and signs, else
    # they mark palatalization of the preceding consonant (approximated by
    # plain consonant + vowel; ʲ is stripped by the reference replacements)
    Rule("е", "je", pre="^|[аеёиоуыэюяъь]"), Rule("е", "e"),
    Rule("ё", "jo", pre="^|[аеёиоуыэюяъь]"), Rule("ё", "o"),
    Rule("ю", "ju", pre="^|[аеёиоуыэюяъь]"), Rule("ю", "u"),
    Rule("я", "ja", pre="^|[аеёиоуыэюяъь]"), Rule("я", "a"),
    Rule("а", "a"), Rule("и", "i"), Rule("о", "o"), Rule("у", "u"),
    Rule("ы", "ɨ"), Rule("э", "e"),
    Rule("б", "b"), Rule("в", "v"), Rule("г", "v", pre="о", post="о$"),
    Rule("г", "ɡ"), Rule("д", "d"), Rule("ж", "ʒ"), Rule("з", "z"),
    Rule("й", "j"), Rule("к", "k"), Rule("л", "l"), Rule("м", "m"),
    Rule("н", "n"), Rule("п", "p"), Rule("р", "r"), Rule("с", "s"),
    Rule("т", "t"), Rule("ф", "f"), Rule("х", "x"), Rule("ц", "ts"),
    Rule("ч", "tɕ"), Rule("ш", "ʃ"), Rule("щ", "ɕː"),
    Rule("ъ", ""), Rule("ь", ""),
]

_RU_DIGITS = ["ноль", "один", "два", "три", "четыре", "пять", "шесть",
              "семь", "восемь", "девять"]

# ---------------------------------------------------------------------------
# Portuguese (eu/br approximation; nasals modeled, reduction not)
# ---------------------------------------------------------------------------

_PT_RULES = [
    Rule("lh", "ʎ"), Rule("nh", "ɲ"), Rule("ch", "ʃ"), Rule("rr", "ʁ"),
    Rule("ss", "s"), Rule("qu", "k", post="[eéêií]"), Rule("qu", "kw"),
    Rule("gu", "ɡ", post="[eéêií]"),
    # nasal vowels use the inventory's combining-tilde modifier (a nasal
    # flag on the preceding vowel), never precomposed codepoints
    Rule("ão", "ɐ̃w"), Rule("õe", "õj"), Rule("ãe", "ɐ̃j"),
    Rule("am", "ɐ̃w", post="$"), Rule("em", "ẽj", post="$"),
    Rule("an", "ɐ̃", post="[^aeiouáéíóú]"), Rule("am", "ɐ̃", post="[pb]"),
    Rule("en", "ẽ", post="[^aeiouáéíóú]"), Rule("em", "ẽ", post="[pb]"),
    Rule("in", "ĩ", post="[^aeiouáéíóú]"), Rule("im", "ĩ", post="[pb$]"),
    Rule("on", "õ", post="[^aeiouáéíóú]"), Rule("om", "õ", post="[pb$]"),
    Rule("un", "ũ", post="[^aeiouáéíóú]"), Rule("um", "ũ", post="[pb$]"),
    Rule("c", "s", post="[eéêií]"), Rule("ç", "s"), Rule("c", "k"),
    Rule("g", "ʒ", post="[eéêií]"), Rule("g", "ɡ"), Rule("j", "ʒ"),
    Rule("x", "ʃ"), Rule("z", "z"), Rule("h", ""),
    Rule("s", "z", pre="[aeiouáéíóúâêô]", post="[aeiouáéíóúâêô]"),
    Rule("s", "ʃ", post="$"), Rule("s", "s"),
    Rule("r", "ʁ", pre="^"), Rule("r", "ɾ"),
    Rule("o", "u", post="$"), Rule("e", "i", post="$"),
    Rule("a", "ɐ", post="$"),
    Rule("a", "a"), Rule("e", "e"), Rule("i", "i"), Rule("o", "o"),
    Rule("u", "u"),
    Rule("á", "ˈa"), Rule("â", "ˈɐ"), Rule("é", "ˈɛ"), Rule("ê", "ˈe"),
    Rule("í", "ˈi"), Rule("ó", "ˈɔ"), Rule("ô", "ˈo"), Rule("ú", "ˈu"),
    Rule("ã", "ɐ̃"), Rule("õ", "õ"),
    Rule("b", "b"), Rule("d", "d"), Rule("f", "f"), Rule("k", "k"),
    Rule("l", "l"), Rule("m", "m"), Rule("n", "n"), Rule("p", "p"),
    Rule("t", "t"), Rule("v", "v"), Rule("w", "w"), Rule("y", "i"),
]

_PT_DIGITS = ["zero", "um", "dois", "três", "quatro", "cinco", "seis",
              "sete", "oito", "nove"]

# ---------------------------------------------------------------------------
# French (approximation; final-syllable prominence)
# ---------------------------------------------------------------------------

# high-frequency function words whose spelling breaks the rules
_FR_LEXICON = {
    "est": "ɛ", "et": "e", "les": "le", "des": "de", "mes": "me",
    "tes": "te", "ses": "se", "ces": "se", "est-ce": "ɛs", "monsieur": "məsjø",
    "eu": "y", "eux": "ø", "deux": "dø", "dix": "dis", "six": "sis",
    "huit": "ɥit", "oui": "wi", "femme": "fam", "fils": "fis",
}

# elided clitics before an apostrophe (c'est, j'ai, qu'il ...)
_FR_CLITICS = {"c": "s", "j": "ʒ", "qu": "k", "s": "s", "t": "t", "l": "l",
               "d": "d", "m": "m", "n": "n"}

_FR_RULES = [
    Rule("eaux", "o"), Rule("eau", "o"), Rule("aux", "o"), Rule("eux", "ø"),
    Rule("ll", "l"), Rule("tt", "t"), Rule("ss", "s"), Rule("mm", "m"),
    Rule("nn", "n"), Rule("rr", "ʁ"), Rule("pp", "p"), Rule("cc", "ks",
    post="[ei]"), Rule("cc", "k"), Rule("ff", "f"), Rule("dd", "d"),
    Rule("oeu", "œ"), Rule("œu", "œ"), Rule("œ", "œ"),
    Rule("tion", "sjɔ̃"), Rule("ille", "ij"), Rule("eil", "ɛj"),
    Rule("ail", "aj"), Rule("gn", "ɲ"),
    Rule("ain", "ɛ̃", post="[^aeiouéèêy]|$"), Rule("aim", "ɛ̃", post="[^aeiouéèêy]|$"),
    Rule("ein", "ɛ̃", post="[^aeiouéèêy]|$"),
    Rule("oin", "wɛ̃", post="[^aeiouéèêy]|$"),
    Rule("an", "ɑ̃", post="[^aeiounmhéèêy]|$"), Rule("am", "ɑ̃", post="[pb]"),
    Rule("en", "ɑ̃", post="[^aeiounmhéèêy]|$"), Rule("em", "ɑ̃", post="[pb]"),
    Rule("in", "ɛ̃", post="[^aeiounmhéèêy]|$"), Rule("im", "ɛ̃", post="[pb]"),
    Rule("on", "ɔ̃", post="[^aeiounmhéèêy]|$"), Rule("om", "ɔ̃", post="[pb]"),
    Rule("un", "œ̃", post="[^aeiounmhéèêy]|$"), Rule("um", "œ̃", post="[pb]"),
    Rule("eau", "o"), Rule("au", "o"), Rule("ou", "u"), Rule("oi", "wa"),
    Rule("ai", "ɛ"), Rule("ei", "ɛ"), Rule("eu", "ø"),
    Rule("ch", "ʃ"), Rule("ph", "f"), Rule("th", "t"), Rule("qu", "k"),
    Rule("gu", "ɡ", post="[eèéêi]"),
    Rule("c", "s", post="[eèéêiy]"), Rule("ç", "s"), Rule("c", "k"),
    Rule("g", "ʒ", post="[eèéêiy]"), Rule("g", "ɡ"),
    Rule("j", "ʒ"), Rule("h", ""),
    Rule("s", "z", pre="[aeiouéèêy]", post="[aeiouéèêy]"),
    Rule("ts", "", post="$"), Rule("ds", "", post="$"),
    Rule("es", "", post="$", pre="[^aeiou]"),  # silent plural/verb endings
    Rule("er", "e", post="$"), Rule("ez", "e", post="$"),
    Rule("et", "ɛ", post="$"),
    Rule("e", "ə", post="$"),
    Rule("s", "", post="$"), Rule("t", "", post="$"), Rule("d", "", post="$"),
    Rule("p", "", post="$"), Rule("x", "", post="$"), Rule("z", "", post="$"),
    Rule("e", "ɛ", post="x"), Rule("e", "ɛ", post="[^aeiou][^aeiou]"),
    Rule("e", "ə"),
    Rule("é", "e"), Rule("è", "ɛ"), Rule("ê", "ɛ"), Rule("ë", "ɛ"),
    Rule("à", "a"), Rule("â", "a"), Rule("î", "i"), Rule("ï", "i"),
    Rule("ô", "o"), Rule("û", "y"), Rule("ù", "y"),
    Rule("a", "a"), Rule("i", "i"), Rule("o", "ɔ"), Rule("u", "y"),
    Rule("y", "i"),
    Rule("b", "b"), Rule("d", "d"), Rule("f", "f"), Rule("k", "k"),
    Rule("l", "l"), Rule("m", "m"), Rule("n", "n"), Rule("p", "p"),
    Rule("r", "ʁ"), Rule("s", "s"), Rule("t", "t"), Rule("v", "v"),
    Rule("w", "w"), Rule("x", "ks"), Rule("z", "z"),
]

_FR_DIGITS = ["zéro", "un", "deux", "trois", "quatre", "cinq", "six",
              "sept", "huit", "neuf"]

# ---------------------------------------------------------------------------
# Vietnamese (quốc ngữ syllable parser; tones like the reference's
# espeak-number -> contour table, TextFrontend.py:304-312)
# ---------------------------------------------------------------------------

_VI_TONE_CONTOUR = {  # tone name -> contour (matches frontend/text._VI_TONES)
    "ngang": "˧", "huyen": "˨˩", "sac": "˧˥", "nga": "˦˧˥",
    "hoi": "˧˩˧", "nang": "˧˩ʔ˨",
}

_VI_TONE_MARKS = {  # combining diacritic -> tone name
    "̀": "huyen", "́": "sac", "̃": "nga",
    "̉": "hoi", "̣": "nang",
}

_VI_ONSETS = [  # longest first
    ("ngh", "ŋ"), ("ng", "ŋ"), ("nh", "ɲ"), ("gh", "ɣ"), ("gi", "z"),
    ("kh", "x"), ("ph", "f"), ("th", "tʰ"), ("tr", "ʈ"), ("ch", "tɕ"),
    ("qu", "kw"), ("b", "ɓ"), ("c", "k"), ("d", "z"), ("đ", "ɗ"),
    ("g", "ɣ"), ("h", "h"), ("k", "k"), ("l", "l"), ("m", "m"),
    ("n", "n"), ("p", "p"), ("r", "z"), ("s", "s"), ("t", "t"),
    ("v", "v"), ("x", "s"),
]

_VI_RIMES = [  # (orthographic rime, IPA) longest first; northern values
    ("uyên", "wien"), ("uyết", "wiet"), ("ươu", "ɨəu"), ("uyê", "wie"),
    ("iêu", "ieu"), ("yêu", "ieu"), ("ươi", "ɨəi"), ("uôi", "uoi"),
    ("oai", "wai"), ("oay", "wai"), ("uây", "wəi"),
    ("iê", "ie"), ("yê", "ie"), ("uô", "uo"), ("ươ", "ɨə"), ("ưa", "ɨə"),
    ("ia", "iə"), ("ua", "uə"), ("ya", "iə"),
    ("ai", "ai"), ("ao", "au"), ("au", "ɐu"), ("ay", "ɐi"), ("âu", "əu"),
    ("ây", "əi"), ("eo", "ɛu"), ("êu", "eu"), ("iu", "iu"), ("oa", "wa"),
    ("oe", "wɛ"), ("oi", "ɔi"), ("ôi", "oi"), ("ơi", "əːi"), ("ui", "ui"),
    ("uy", "wi"), ("ưi", "ɨi"), ("ưu", "ɨu"), ("uê", "we"),
    ("a", "aː"), ("ă", "ɐ"), ("â", "ə"), ("e", "ɛ"), ("ê", "e"),
    ("i", "i"), ("y", "i"), ("o", "ɔ"), ("ô", "o"), ("ơ", "əː"),
    ("u", "u"), ("ư", "ɨ"),
]

_VI_CODAS = [
    ("ng", "ŋ"), ("nh", "ɲ"), ("ch", "k"), ("c", "k"), ("m", "m"),
    ("n", "n"), ("p", "p"), ("t", "t"),
]

_VI_DIGITS = ["không", "một", "hai", "ba", "bốn", "năm", "sáu", "bảy",
              "tám", "chín"]


def _vi_syllable(syl: str) -> str:
    """One quốc-ngữ syllable -> IPA + tone contour."""
    decomp = unicodedata.normalize("NFD", syl.lower())
    tone = "ngang"
    stripped = []
    for ch in decomp:
        if ch in _VI_TONE_MARKS:
            tone = _VI_TONE_MARKS[ch]
        else:
            stripped.append(ch)
    word = unicodedata.normalize("NFC", "".join(stripped))

    out = []
    i = 0
    for src, ipa in _VI_ONSETS:
        if word.startswith(src):
            # c/k/g spelling conventions: "gi" before vowel keeps /z/; "q"
            # only occurs as "qu"
            if src == "gi" and len(word) == 2:  # "gì" -> /zi/
                return "zi" + _VI_TONE_CONTOUR[tone]
            out.append(ipa)
            i = len(src)
            break
    rest = word[i:]
    coda = ""
    for src, ipa in _VI_CODAS:
        if rest.endswith(src) and len(rest) > len(src):
            coda = ipa
            rest = rest[:-len(src)]
            break
    nucleus = ""
    for src, ipa in _VI_RIMES:
        if rest == src:
            nucleus = ipa
            break
    if not nucleus:  # grapheme-by-grapheme fallback
        table = dict(_VI_RIMES)
        nucleus = "".join(table.get(c, "") for c in rest)
    return "".join(out) + nucleus + _VI_TONE_CONTOUR[tone] + coda


def _vi_g2p(text: str) -> str:
    parts = []
    for token in text.split():
        m = re.match(r"(\W*)([\w]*)(\W*)$", token, re.UNICODE)
        lead, core, trail = m.groups() if m else ("", token, "")
        if core:
            core = _vi_syllable(core)
        parts.append(lead + core + trail)
    return " ".join(parts)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _language(lang: str) -> Language:
    table: Dict[str, Tuple[list, Callable, list]] = {
        "es": (_ES_RULES, stress_spanish, _ES_DIGITS),
        "it": (_IT_RULES, stress_italian, _IT_DIGITS),
        "fi": (_FI_RULES, stress_initial, _FI_DIGITS),
        "el": (_EL_RULES, stress_marked_only, _EL_DIGITS),
        "hu": (_HU_RULES, stress_initial, _HU_DIGITS),
        "pl": (_PL_RULES, stress_penult, _PL_DIGITS),
        "nl": (_NL_RULES, stress_initial, _NL_DIGITS),
        "de": (_DE_RULES, stress_initial, _DE_DIGITS),
        "ru": (_RU_RULES, stress_marked_only, _RU_DIGITS),
        "pt": (_PT_RULES, stress_portuguese, _PT_DIGITS),
        "pt-br": (_PT_RULES, stress_portuguese, _PT_DIGITS),
        "fr": (_FR_RULES, stress_french, _FR_DIGITS),
    }
    rules, stress, digits = table[lang]
    return Language(RuleSet(rules), stress, digits)


RULE_G2P_LANGUAGES = ("es", "it", "fi", "el", "hu", "pl", "nl", "de", "ru",
                      "pt", "pt-br", "fr", "vi")

_WORD_RX = re.compile(r"[^\W\d_]+(?:['-][^\W\d_]+)*", re.UNICODE)

# The inventory expresses nasality as a combining-tilde modifier on the
# preceding vowel; decompose any precomposed codepoint a ruleset emitted.
_PRECOMPOSED = str.maketrans({
    "ẽ": "ẽ", "ĩ": "ĩ", "õ": "õ", "ũ": "ũ",
    "ã": "ã", "ỹ": "ỹ",
})


def phonemize_rules(text: str, lang: str) -> str:
    """Plain text -> IPA (with stress marks / tone contours) for ``lang``.

    Word-by-word: letters phonemize through the language's ruleset; digits
    read digit-by-digit; punctuation passes through for the frontend's
    pause handling (``postprocess_phoneme_string``)."""
    if lang == "vi":
        return _vi_g2p(text).translate(_PRECOMPOSED)
    spec = _language(lang)
    lexicon = _FR_LEXICON if lang == "fr" else {}

    def read_digits(m):
        return " " + " ".join(spec.digits[int(d)] for d in m.group(0)) + " "

    text = re.sub(r"\d+", read_digits, text.lower())

    def convert(m):
        if m.group(0) in lexicon:
            return spec.stress(m.group(0), lexicon[m.group(0)])
        # apostrophes delimit clitics (French c'est = c' + est: each part
        # phonemizes with its own contexts); hyphens just join
        parts = [p for p in m.group(0).replace("-", "").split("'") if p]
        ipa = ""
        for pi, p in enumerate(parts):
            if lang == "fr" and pi < len(parts) - 1 and p in _FR_CLITICS:
                ipa += _FR_CLITICS[p]  # elided clitic keeps only its onset
            else:
                ipa += lexicon.get(p, spec.rules.apply(p))
        return spec.stress(m.group(0).replace("'", "").replace("-", ""), ipa)

    return _WORD_RX.sub(convert, text).translate(_PRECOMPOSED)
