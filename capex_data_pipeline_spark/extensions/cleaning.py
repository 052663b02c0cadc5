"""Corpus-cleaning operators a web-scale training pipeline runs before
dedup/tokenization: PII detection + redaction, URL/domain extraction,
line-level boilerplate filtering (C4-style), and repetition metrics
(Gopher-style quality signals).

Shapes chosen for 100 TB:

- PII, URL extraction and line filtering are pure projections (regex
  counts/replaces and higher-order array functions) — map-only, no
  shuffle, whole-stage codegen.
- Repetition metrics need per-document mode statistics (the most
  frequent word / bigram).  A per-row higher-order-function fold would
  be O(len²) per document — quadratic in the 100k-token tail — so the
  operator instead explodes grams and aggregates: shuffle keys are the
  compact ``(doc_id, gram)`` pairs, count-distinct-style two-level
  aggregation, linear end to end.

Every regex here is deliberately RE2-compatible (no lookarounds, no
backreferences) so a DuckDB oracle replays it byte-for-byte (registry
q63/q64/q65/q66).  Java and RE2 agree on leftmost match + greedy
quantifier semantics for this pattern family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- PII pattern family (public, standard shapes; RE2-compatible) ------
#: email addresses
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: IPv4 addresses (format-shaped; does not range-check octets)
IPV4_REGEX = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
#: international-ish phone numbers: +CC then 8-14 digits with
#: separators (the leading + keeps this from swallowing bare ids)
PHONE_REGEX = r"\+[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3}[- .]?[0-9]{2,4}\b"
#: long digit runs (card/account-shaped): 13-19 digits, optional
#: single separators
ID_RUN_REGEX = r"\b[0-9]{4}([- ][0-9]{4}){2,3}\b"

#: redaction order matters — emails contain dots that IPV4 could
#: otherwise nibble, and phone/id runs overlap; this order is part of
#: the operator contract (oracle replays it in the same order)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_REGEX, "<EMAIL>"),
    ("ipv4", IPV4_REGEX, "<IP>"),
    ("phone", PHONE_REGEX, "<PHONE>"),
    ("id_run", ID_RUN_REGEX, "<ID>"),
)

#: URLs: scheme + non-space run, trailing sentence punctuation excluded
URL_REGEX = r"https?://[^\s<>\"']+[^\s<>\"'.,;:!?)]"
#: capture group 1 = host
_URL_HOST_REGEX = r"https?://([^/\s:]+)"


def _text(col: Column) -> Column:
    return F.coalesce(col.cast("string"), F.lit(""))


def pii_stats(col: Column) -> dict[str, Column]:
    """Match counts per PII class — the audit signal that decides
    whether a document is dropped vs redacted. One projection."""
    return {
        f"n_{name}": F.regexp_count(_text(col), F.lit(pat))
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its class token, in the documented
    PII_PATTERNS order. Chained regexp_replace — still one projection,
    JVM-side."""
    out = _text(col)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def extract_urls(col: Column) -> Column:
    """All URL spans in the text, in document order (array<string>)."""
    return F.regexp_extract_all(_text(col), F.lit(URL_REGEX), F.lit(0))


def url_host(url: Column) -> Column:
    """Lowercased host of a URL, ``www.`` prefix stripped — the key
    domain-level corpus curation groups by (blocklists, per-domain
    caps, quality priors)."""
    host = F.lower(F.regexp_extract(url, _URL_HOST_REGEX, 1))
    return F.regexp_replace(host, r"^www\.", "")


def domain_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus statistics: how many URL mentions and how many
    distinct documents cite each domain.  Extraction is a map-only
    projection; the aggregate shuffles on the compact domain string
    (high-cardinality in real crawls — spreads evenly; the
    head-of-distribution hot keys are AQE skew-split)."""
    urls = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(extract_urls(F.col(text_col))).alias("_url"),
    )
    return (
        urls.select("_doc", url_host(F.col("_url")).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("_doc").alias("n_docs"),
        )
    )


# --- line-level boilerplate filtering (C4-style) -----------------------

#: a "kept" line ends in terminal punctuation when the policy asks
TERMINAL_PUNCT_REGEX = r'[.!?"”]$'


def clean_lines(
    col: Column,
    min_words: int = 3,
    require_terminal_punct: bool = False,
    dedup_lines: bool = True,
) -> Column:
    """C4-style line filter as a struct column: split the document on
    newlines, keep lines with ≥ ``min_words`` whitespace words (and, if
    asked, terminal punctuation), optionally drop repeated lines
    keeping the FIRST occurrence (menus/nav boilerplate), and re-join.

    Pure higher-order array functions — map-only at any scale.  First-
    occurrence dedup uses ``array_distinct`` (order-preserving in
    Spark; the oracle re-derives it with ``list_position``).

    Returns struct(cleaned, n_lines, n_kept).
    """
    lines = F.split(_text(col), r"\n")

    def keep(line: Column) -> Column:
        words = F.size(
            F.filter(F.split(F.trim(line), r"\s+"), lambda w: w != "")
        )
        cond = words >= F.lit(min_words)
        if require_terminal_punct:
            cond = cond & F.trim(line).rlike(TERMINAL_PUNCT_REGEX)
        return cond

    kept = F.filter(lines, keep)
    if dedup_lines:
        kept = F.array_distinct(kept)
    return F.struct(
        F.array_join(kept, "\n").alias("cleaned"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
    )


# --- repetition metrics (Gopher-style) ---------------------------------


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``top_word_frac``   — occurrences of the most frequent word over
      total words (normalized: lowercase, alnum runs),
    - ``top_bigram_frac`` — occurrences of the most frequent word
      bigram over total bigrams,
    - ``dup_line_frac``   — lines occurring more than once over total
      lines (empty lines excluded),
    - ``dup_line_char_frac`` — characters in those duplicate lines over
      total line characters.

    High values mark degenerate/boilerplate text (the Gopher filters
    drop docs past thresholds — thresholding is the caller's policy,
    the metrics are the operator).

    Scale shape: one explode of tagged grams (word / bigram / line) →
    count per ``(doc, kind, gram)`` → per-doc aggregate.  Two hash
    aggregations on compact keys, no per-row quadratic folds, no
    Python.  Docs with no words/bigrams/lines report 0.0 for the
    corresponding fractions.  Left join back to the id spine keeps
    empty documents in the output (all-zero metrics).
    """
    words = F.filter(
        F.split(
            F.regexp_replace(F.lower(_text(F.col(text_col))), r"[^a-z0-9]+", " "),
            " ",
        ),
        lambda s: s != "",
    )
    bigrams = F.when(F.size(words) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
        )
    )
    lines = F.filter(
        F.transform(F.split(_text(F.col(text_col)), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    tag = lambda kind, arr: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(kind).alias("kind"), g.alias("gram"))
    )
    grams = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.concat(tag("w", words), tag("b", bigrams), tag("l", lines))
        ).alias("g"),
    ).select("_doc", F.col("g.kind").alias("_kind"), F.col("g.gram").alias("_gram"))

    per_gram = grams.groupBy("_doc", "_kind", "_gram").agg(
        F.count(F.lit(1)).alias("_n")
    )
    is_w = F.col("_kind") == "w"
    is_b = F.col("_kind") == "b"
    is_l = F.col("_kind") == "l"
    dup_l = is_l & (F.col("_n") > 1)
    line_chars = F.length(F.col("_gram")) * F.col("_n")
    agg = per_gram.groupBy("_doc").agg(
        F.sum(F.when(is_w, F.col("_n")).otherwise(0)).alias("_nw"),
        F.max(F.when(is_w, F.col("_n"))).alias("_topw"),
        F.sum(F.when(is_b, F.col("_n")).otherwise(0)).alias("_nb"),
        F.max(F.when(is_b, F.col("_n"))).alias("_topb"),
        F.sum(F.when(is_l, F.col("_n")).otherwise(0)).alias("_nl"),
        F.sum(F.when(dup_l, F.col("_n")).otherwise(0)).alias("_dupl"),
        F.sum(F.when(is_l, line_chars).otherwise(0)).alias("_lchars"),
        F.sum(F.when(dup_l, line_chars).otherwise(0)).alias("_duplchars"),
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0), 6
        )

    metrics = agg.select(
        F.col("_doc").alias(id_col),
        frac(F.coalesce(F.col("_topw"), F.lit(0)), F.col("_nw")).alias("top_word_frac"),
        frac(F.coalesce(F.col("_topb"), F.lit(0)), F.col("_nb")).alias(
            "top_bigram_frac"
        ),
        frac(F.col("_dupl"), F.col("_nl")).alias("dup_line_frac"),
        frac(F.col("_duplchars"), F.col("_lchars")).alias("dup_line_char_frac"),
    )
    spine = docs.select(F.col(id_col))
    return spine.join(metrics, id_col, "left").select(
        id_col,
        *[
            F.coalesce(F.col(c), F.lit(0.0)).alias(c)
            for c in (
                "top_word_frac",
                "top_bigram_frac",
                "dup_line_frac",
                "dup_line_char_frac",
            )
        ],
    )
