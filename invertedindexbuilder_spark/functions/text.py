"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, content hashing.

All are pure Spark column expressions (JVM-side, whole-stage codegen)
so they run at scan speed with no Python in the loop; each has an
ANSI-SQL twin in __spark_entry__.oracle_sql for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (deterministic heuristic — a
# real pipeline would plug fasttext here; the *Spark plumbing* is the
# deliverable: pure column ops, no shuffle, no UDF)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(text), F.lit(" "))


def lang_marker_hits(text: Column, lang: str) -> Column:
    """Number of marker-word occurrences for one language.
    regexp_count keeps the expression small enough for whole-stage
    codegen (a length-difference formulation blew past janino's 64 KB
    method limit and fell back to interpreted eval)."""
    padded = _padded(text)
    total = F.lit(0)
    for w in LANG_MARKERS[lang]:
        total = total + F.regexp_count(padded, F.lit(f" {w} "))
    return total


def lang_id(text: Column) -> Column:
    """argmax language over marker hits; 'und' when all zero.
    Ties break by language-code order (deterministic, SQL-replicable)."""
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        hits = lang_marker_hits(text, lang)
        take = hits > best_hits  # strict > keeps earlier lang on ties
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return best_lang


def ws_token_count(text: Column) -> Column:
    """Whitespace token count = number of \\S+ runs (match-counting, not
    split: split would produce a phantom empty token after leading
    whitespace)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), 0))


def alnum_token_count(text: Column) -> Column:
    """BPE-ish unit count: alnum runs + each non-alnum-non-space char
    counts as one token (approximates byte-level BPE pretokenization)."""
    alnum_runs = F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+"), 0))
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return alnum_runs + punct


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic combining length, mean
    word length, and punctuation ratio — the standard cheap pre-filter
    shape for training-data curation."""
    n_chars = F.length(text)
    n_ws = ws_token_count(text)
    mean_wl = F.when(n_ws > 0, n_chars / n_ws).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")) / n_chars,
    ).otherwise(F.lit(1.0))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round(len_ok * wl_ok * (F.lit(1.0) - punct_ratio), 6)


def content_hash64(text: Column) -> Column:
    """Cross-engine deterministic 64-bit-ish content hash: first 15 hex
    chars of md5 as a BIGINT (same value computable in DuckDB via
    CAST('0x'||SUBSTR(md5(x),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("long")


def hash32(col: Column, salt: int | None = None) -> Column:
    """32-bit cross-engine hash (md5 prefix), optionally salted —
    the primitive under minhash/simhash so Spark and DuckDB agree."""
    s = F.concat(F.lit(f"{salt}:"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


# ------------------------------------------------------------------ PII
# Both patterns are deliberately RE2-safe (no backrefs, no lookaround)
# so the same literal string runs in Spark (java.util.regex) and DuckDB
# (RE2) — the oracle twin uses them verbatim.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}-[0-9]{4}-[0-9]{4}"


def pii_email_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_PATTERN)).cast("long")


def pii_phone_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PHONE_PATTERN)).cast("long")


def redact_pii(text: Column) -> Column:
    """Replace every email / phone-shaped span with a typed placeholder
    (emails first: the phone pattern cannot match inside an email's
    local part after alnum runs are consumed, and neither placeholder
    re-triggers the other pattern).  Pure column expression — redaction
    runs at scan speed with zero Python in the loop."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )
