"""Code-aware text functions for a source-code corpus (the engine's
north-star input is an Iceberg table of source files): identifier
subtoken splitting and per-line statistics.

All pure Spark column expressions (JVM-side, whole-stage codegen) with
ANSI-SQL twins in ``__spark_entry__.oracle_sql`` — regex PATTERNS are
shared verbatim between engines (RE2-safe: no lookaround/backrefs in
the match side); only the replacement backref SYNTAX differs ($1 in
Java, \\1 in RE2), which each side spells natively.

Reference anchor: the reference tokenizer (main.c:104-123) treats
``getUserAccountManager`` as ONE >15-char token and drops it — a code
corpus loses every long identifier.  Subtoken splitting is the standard
code-search fix (camelCase / snake_case / digit boundaries), applied
here BEFORE the index tokenizer so split parts land within the length
filter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# boundary patterns (match side shared with the SQL twin):
#  1. lower/digit -> Upper        fooBar   -> foo Bar
#  2. UPPER run -> Upper lower    HTTPServer -> HTTP Server
#  3. letter <-> digit boundary   utf8Name -> utf 8 Name, v2 -> v 2
CAMEL_1 = "([a-z0-9])([A-Z])"
CAMEL_2 = "([A-Z]+)([A-Z][a-z])"
ALPHA_NUM = "([A-Za-z])([0-9])"
NUM_ALPHA = "([0-9])([A-Za-z])"


def split_identifiers(text: Column) -> Column:
    """Insert spaces at identifier-subtoken boundaries (camelCase,
    UPPERRun, letter/digit) and replace underscores, then lowercase —
    feeding the result to any word tokenizer yields subtoken terms."""
    out = F.regexp_replace(text, CAMEL_2, "$1 $2")
    out = F.regexp_replace(out, CAMEL_1, "$1 $2")
    out = F.regexp_replace(out, ALPHA_NUM, "$1 $2")
    out = F.regexp_replace(out, NUM_ALPHA, "$1 $2")
    return F.lower(F.regexp_replace(out, "_", " "))


def subtokens(text: Column) -> Column:
    """Array of lowercase identifier subtokens ([a-z0-9]+ runs of the
    boundary-split text)."""
    return F.regexp_extract_all(split_identifiers(text), F.lit("[a-z0-9]+"), 0)


def _line_lengths(text: Column) -> Column:
    return F.transform(F.split(text, "\n", -1), lambda x: F.length(x))


def code_line_stats(text: Column) -> list[Column]:
    """Per-doc line metrics (the StarCoder/Codex pre-filters): line
    count, max line length, mean line length (rounded to 6).  Returns
    the three alias-less columns; callers alias them."""
    lens = _line_lengths(text)
    n_lines = F.size(lens).cast("long")
    total = F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x)
    return [
        n_lines,
        F.array_max(lens).cast("long"),
        F.round(total / n_lines, 6),
    ]


def alnum_fraction(text: Column) -> Column:
    """Fraction of characters that are alphanumeric (rounded to 6; the
    classic binary/minified-blob filter).  1.0 convention for empty."""
    n = F.length(text)
    a = F.length(F.regexp_replace(text, "[^A-Za-z0-9]", ""))
    return F.when(n > 0, F.round(a / n, 6)).otherwise(F.lit(1.0))
