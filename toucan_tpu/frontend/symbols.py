"""Symbol reading: %, currency signs and degrees, per language.

espeak (the reference's G2P backend, ``Preprocessing/TextFrontend.py:298``)
reads "50%" as "fifty percent" and "$5" as "five dollars"; the first-party
G2P paths previously dropped the signs.  ``expand_symbols`` rewrites the
symbols to words BEFORE numeral expansion (``frontend/numbers.py``), so
"20€" becomes "twenty euros" end-to-end.

Conventions: currency signs read after the amount regardless of written
order ("$5" -> "5 dollars"); singular forms apply at exactly 1 where the
language inflects; Slavic counts use the genitive-plural form (the most
common case after numerals — a full case grammar is out of scope and
documented in G2P.md).  Mandarin is handled in pinyin space by the caller
(百分之 prefixing is structural, not lexical).
"""

from __future__ import annotations

import re

# lang -> {symbol: (singular, plural)}; one form = invariant
_WORDS = {
    "en": {"%": "percent", "$": ("dollar", "dollars"),
           "€": ("euro", "euros"), "£": ("pound", "pounds"),
           "°": ("degree", "degrees"), "&": "and", "+": "plus"},
    "es": {"%": "por ciento", "$": ("dólar", "dólares"),
           "€": ("euro", "euros"), "£": ("libra", "libras"),
           "°": ("grado", "grados"), "&": "y", "+": "más"},
    "de": {"%": "Prozent", "$": "Dollar", "€": "Euro", "£": "Pfund",
           "°": "Grad", "&": "und", "+": "plus"},
    "fr": {"%": "pour cent", "$": ("dollar", "dollars"),
           "€": ("euro", "euros"), "£": ("livre", "livres"),
           "°": ("degré", "degrés"), "&": "et", "+": "plus"},
    "it": {"%": "per cento", "$": ("dollaro", "dollari"), "€": "euro",
           "£": ("sterlina", "sterline"), "°": ("grado", "gradi"),
           "&": "e", "+": "più"},
    "pt": {"%": "por cento", "$": ("dólar", "dólares"),
           "€": ("euro", "euros"), "£": ("libra", "libras"),
           "°": ("grau", "graus"), "&": "e", "+": "mais"},
    "nl": {"%": "procent", "$": "dollar", "€": "euro", "£": "pond",
           "°": ("graad", "graden"), "&": "en", "+": "plus"},
    "pl": {"%": "procent", "$": "dolarów", "€": "euro", "£": "funtów",
           "°": "stopni", "&": "i", "+": "plus"},
    "ru": {"%": "процентов", "$": "долларов", "€": "евро",
           "£": "фунтов", "°": "градусов", "&": "и", "+": "плюс"},
    "uk": {"%": "відсотків", "$": "доларів", "€": "євро",
           "£": "фунтів", "°": "градусів", "&": "і", "+": "плюс"},
    "fi": {"%": "prosenttia", "$": "dollaria", "€": "euroa",
           "£": "puntaa", "°": "astetta", "&": "ja", "+": "plus"},
    "hu": {"%": "százalék", "$": "dollár", "€": "euró", "£": "font",
           "°": "fok", "&": "és", "+": "plusz"},
    "el": {"%": "τοις εκατό", "$": "δολάρια", "€": "ευρώ",
           "£": "λίρες", "°": "βαθμοί", "&": "και", "+": "συν"},
    "vi": {"%": "phần trăm", "$": "đô la", "€": "euro", "£": "bảng",
           "°": "độ", "&": "và", "+": "cộng"},
    "fa": {"%": "درصد", "$": "دلار", "€": "یورو", "£": "پوند",
           "°": "درجه", "&": "و", "+": "به‌علاوه"},
}
_WORDS["pt-br"] = _WORDS["pt"]

_CURRENCY = "€$£"
_DEGREE_SCALE = {"C": {"en": "Celsius", "de": "Celsius", "fr": "Celsius",
                       "es": "Celsius", "default": "Celsius"},
                 "F": {"default": "Fahrenheit"}}


def _form(words, sym: str, n: int | None):
    w = words[sym]
    if isinstance(w, tuple):
        return w[0] if n == 1 else w[1]
    return w


def expand_symbols(text: str, lang: str) -> str:
    """Rewrite %, currency and degree signs into words for ``lang``;
    unknown languages return the text unchanged."""
    words = _WORDS.get(lang)
    if words is None:
        return text

    def num_of(s):
        try:
            return int(s)
        except ValueError:
            return None

    # $5 / €20 / £3 (sign before amount) -> "5 dollars"
    def pre_currency(m):
        sym, amount = m.group(1), m.group(2)
        return f"{amount} {_form(words, sym, num_of(amount))}"

    text = re.sub(r"([€$£])\s?(\d+(?:[.,]\d+)?)", pre_currency, text)

    # 20€ (amount before sign)
    def post_currency(m):
        amount, sym = m.group(1), m.group(2)
        return f"{amount} {_form(words, sym, num_of(amount))}"

    text = re.sub(r"(\d+(?:[.,]\d+)?)\s?([€$£])", post_currency, text)

    # 20°C / 20° -> "20 degrees Celsius" / "20 degrees"
    def degrees(m):
        amount, scale = m.group(1), m.group(2)
        deg = _form(words, "°", num_of(amount))
        if scale:
            table = _DEGREE_SCALE.get(scale.upper(), {})
            return f"{amount} {deg} {table.get(lang, table.get('default', scale))}"
        return f"{amount} {deg}"

    text = re.sub(r"(\d+(?:[.,]\d+)?)\s?°\s?([CF])?", degrees, text)

    # 50% -> "50 percent"; standalone signs read as their word too
    def percent(m):
        return f"{m.group(1)} {_form(words, '%', num_of(m.group(1)))}"

    text = re.sub(r"(\d+(?:[.,]\d+)?)\s?%", percent, text)
    for sym in "%&+" + _CURRENCY:
        if sym in text:
            text = text.replace(sym, f" {_form(words, sym, None)} ")
    return re.sub(r"\s+", " ", text)
