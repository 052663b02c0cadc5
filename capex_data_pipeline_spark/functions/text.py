"""Negation-aware phrase matching as native Catalyst expressions.

The reference implements remark analysis with per-row Python
(``process_capex.py:82-145``): tokenize with ``[a-zA-Z0-9']+``, find
word-bounded phrase matches, and suppress a match when a negation word
occurs within the 3 tokens immediately preceding it
(``_is_negated``, ``process_capex.py:105-114``).

We compile the same semantics into a single Java regex per phrase using a
bounded lookbehind, so the whole check runs inside whole-stage codegen —
no Python, no Arrow transfer, scales linearly with executors:

    (?<!  NEG_WORD  (sep token){0,2}  sep  )  \\b phrase \\b

i.e. "a phrase match NOT preceded by a negation word at token-distance
1..3". Java (unlike RE2/PCRE) supports bounded-length lookbehind, which
is exactly what a fixed 3-token window needs.

Phrase lists are behavioral constants of the reference
(``process_capex.py:63-80``), reproduced for parity.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- behavioral constants (reference: process_capex.py:63-80) ---
NEGATION_WORDS: tuple[str, ...] = (
    "no", "not", "without", "exclude", "excluding", "except",
    "avoid", "cancel", "cancelled", "drop", "skip",
)
IT_NON_RELEVANT: tuple[str, ...] = (
    "test", "demo", "sample", "trial", "pilot", "experimental",
)
PERSONAL_NONBUSINESS: tuple[str, ...] = (
    "personal", "individual", "non-business", "non operational", "non-operational",
)
EXPERIMENTAL: tuple[str, ...] = ("experimental",)
DARK_STORE: tuple[str, ...] = ("dark store", "dark-store", "darkstores", "darkstore")
COUNTER: tuple[str, ...] = ("counter",)
PERSONAL_DEVICE_WORDS: tuple[str, ...] = (
    "laptop", "macbook", "notebook", "macbook pro", "macbook air", "chromebook",
    "tablet", "ipad", "surface pro", "iphone", "mobile phone", "smartphone",
    "dell", "hp", "lenovo", "asus",
)

# Token alphabet of the reference tokenizer [a-zA-Z0-9']+
# (process_capex.py:87-88). A "separator" is any other char.
# Java lookbehind demands an obvious maximum length, so the bounded
# variants below cap token length at 40 and separator runs at 20 chars —
# far beyond anything in real remark text. TESTED divergence bound
# (tests/test_text.py::test_property_lookbehind_caps): when a token
# > 40 chars or a separator run > 20 chars sits between a negation word
# and the phrase (inside the 3-token window), the lookbehind cannot
# span it and the matcher FAILS OPEN — it flags the phrase even though
# the reference would treat it as negated. The divergence is one-sided:
# the capped matcher never misses a flag the reference would raise
# (tests/test_text.py::test_property_cap_divergence_is_one_sided).
# At or below the caps, parity is exact.
_TOKEN = "[a-zA-Z0-9']{1,40}"
_SEP = "[^a-zA-Z0-9']{1,20}"


def _java_escape(literal: str) -> str:
    """Escape a literal for embedding in a Java regex (same effect as
    Python's re.escape for the characters our phrases contain)."""
    return re.escape(literal)


def phrase_pattern(phrase: str) -> str:
    """Word-bounded, case-insensitive pattern for one phrase
    (mirrors _contains_phrase, process_capex.py:90-103 — both of its
    branches produce the identical ``\\bphrase\\b`` pattern)."""
    return rf"(?i)\b{_java_escape(phrase.lower().strip())}\b"


def _negation_lookbehind() -> str:
    """Lookbehind asserting a negation token at distance 1..3 before here."""
    neg_alt = "|".join(NEGATION_WORDS)
    # (?<![tokenchar]) guards the left edge of the negation word so that
    # e.g. the 'no' inside "o'no" (a single reference token) doesn't count.
    # Java additionally rejects counted group repetition ({0,2}) inside a
    # lookbehind, so the "up to two intervening tokens" part is expanded
    # into two optional groups.
    opt_tok = rf"(?:{_SEP}{_TOKEN})?"
    return rf"(?<!(?<![a-zA-Z0-9'])(?:{neg_alt}){opt_tok}{opt_tok}{_SEP})"


def negation_aware_pattern(phrase: str) -> str:
    """Pattern matching ``phrase`` only where it is NOT negated."""
    p = _java_escape(phrase.lower().strip())
    return rf"(?i){_negation_lookbehind()}\b{p}\b"


def negation_aware_any_pattern(phrases) -> str:
    """One pattern for "ANY phrase has a non-negated occurrence".

    Equivalent to OR-ing the per-phrase patterns — the lookbehind is
    evaluated at each alternation match — but the engine scans the text
    once instead of once per phrase (the phrase lists run to 16 entries;
    this is the hot path of the rule passes)."""
    alt = "|".join(_java_escape(p.lower().strip()) for p in phrases)
    return rf"(?i){_negation_lookbehind()}\b(?:{alt})\b"


# --- Column builders -------------------------------------------------------


def _norm(col: Column) -> Column:
    """None/NaN-safe remark normalization (process_capex.py:82-85)."""
    return F.coalesce(col.cast("string"), F.lit(""))


def phrase_match(col: Column, phrase: str) -> Column:
    """True when the word-bounded phrase occurs anywhere (not negation-aware)."""
    return _norm(col).rlike(phrase_pattern(phrase))


def any_phrase(col: Column, phrases: tuple[str, ...] | list[str]) -> Column:
    out = F.lit(False)
    for p in phrases:
        out = out | phrase_match(col, p)
    return out


def negation_aware_phrase(col: Column, phrase: str) -> Column:
    """True when the phrase occurs somewhere NOT preceded (within 3 tokens)
    by a negation word — the U2 semantics of process_capex.py:116-122."""
    return _norm(col).rlike(negation_aware_pattern(phrase))


def negation_aware_any(col: Column, phrases: tuple[str, ...] | list[str]) -> Column:
    return _norm(col).rlike(negation_aware_any_pattern(phrases))


def remark_flag_cols(col: Column) -> dict[str, Column]:
    """The six remark flags of ``remark_flags`` (process_capex.py:130-145),
    as native boolean Columns. ``mentions_ds_word`` is a plain word-bounded
    match (the reference does not apply negation-awareness to it)."""
    return {
        "is_test_demo": negation_aware_any(col, IT_NON_RELEVANT),
        "is_personal_nonbusiness": negation_aware_any(col, PERSONAL_NONBUSINESS),
        "is_experimental": negation_aware_any(col, EXPERIMENTAL),
        "mentions_dark_store": negation_aware_any(col, DARK_STORE),
        "mentions_counter": negation_aware_any(col, COUNTER),
        "mentions_ds_word": _norm(col).rlike(r"(?i)\bds\b"),
    }


# --- pure-Python mirror (for property tests only; never in a Spark plan) ---


def _py_tokens(text: str) -> list[str]:
    return re.findall(r"[a-zA-Z0-9']+", text.lower())


def py_negation_aware_any(text: str | None, phrases) -> bool:
    """Reference-equivalent Python oracle used by the unit/property tests
    to validate the compiled regex against the token-window definition."""
    if text is None:
        return False
    tl = str(text).strip().lower()
    for phrase in phrases:
        pat = re.compile(rf"\b{re.escape(phrase.lower().strip())}\b")
        for m in pat.finditer(tl):
            window = _py_tokens(tl[: m.start()])[-3:]
            if not any(neg in window for neg in NEGATION_WORDS):
                return True
    return False
