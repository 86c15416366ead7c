"""Phrase search (positional postings) and trigram-accelerated
substring search — the two query classes a CODE corpus needs beyond
BM25 bag-of-words ranking.

Reference anchor: the reference tokenizer emits (term, doc_id, pos)
but never stores pos (main.c:85-126; SURVEY §2 P1 "pos is computed but
unused — no positional index").  This module keeps what the reference
throws away and builds the standard code-search structures on top:

- ``positional_postings``: (term, doc_id, positions array) — the
  phrase-capable posting list.  One groupBy keyed by (term, doc_id)
  (same shuffle shape as the tf aggregation A1); position arrays are
  bounded by per-doc term frequency.
- ``phrase_match``: docs containing an exact consecutive-token phrase,
  via first-term positions joined against each later term's positions
  at the aligned offset — n-1 joins ALL keyed by (doc_id, position),
  no array blowup, each join semi-restricted by the previous.  At
  scale every join co-locates on doc_id; the rarest-term-first
  restriction mirrors the conjunctive DAAT policy (Q5).
- ``char_trigram_postings`` / ``substring_search``: the Zoekt /
  Google-Code-Search design — distinct character trigrams per doc as
  the index; a substring query intersects the posting lists of the
  needle's trigrams (df-ascending, rarest first) and ONLY candidate
  docs are verified with an exact ``contains`` scan.  At 100 TB the
  trigram table is partitioned by trigram prefix so the ``isin``
  filter prunes file listings; verification touches candidate docs
  only — the full-corpus scan happens never.

Both query results are brute-force-equal by construction (candidates
are then verified exactly), which is what their oracle gates check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from invertedindexbuilder_spark.operators.dedup import tokens_expr


def positional_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, positions) — 1-based token positions, ascending.
    Tokenization = the curation tokenizer (lowercase [a-z0-9]+ runs,
    uncapped length): phrase semantics should see every token, unlike
    the index tokenizer's 15-char cap."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens_expr(text_col)).alias("_p0", "term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list(F.col("_p0") + 1)).alias("positions"))
    )


def phrase_match(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Docs containing ``phrase`` as consecutive tokens.  Returns
    (doc_id, n_occurrences), n_occurrences = number of starting
    positions.  Pass a pre-built (cached/materialized)
    ``positional_postings`` frame to skip re-tokenizing.

    Plan: explode the FIRST term's positions as candidate starts, then
    for each later term i an INNER join on (doc_id, start + i) —
    every surviving row is a verified full occurrence, so no separate
    verify pass is needed.  All joins are equi-joins on (doc_id,
    position): co-located once the postings are bucketed by doc_id.
    """
    import re

    # query-side tokenization MUST mirror tokens_expr ([a-z0-9]+ runs):
    # a whitespace split would keep 'foo-bar' as one query token that
    # can never match any posting term
    terms = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("empty phrase")
    pp = (
        postings
        if postings is not None
        else positional_postings(docs, text_col, id_col)
    )
    starts = (
        pp.filter(F.col("term") == terms[0])
        .select("doc_id", F.explode("positions").alias("_start"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pp.filter(F.col("term") == t).select(
            "doc_id", F.explode("positions").alias("_pi")
        )
        starts = starts.join(
            nxt,
            (starts["doc_id"] == nxt["doc_id"])
            & (nxt["_pi"] == starts["_start"] + i),
        ).select(starts["doc_id"], starts["_start"])
    return starts.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )


def _deletion_variants_expr(term, max_dist: int):
    """Array of strings reachable from ``term`` by deleting up to
    ``max_dist`` characters (the term itself included).  max_dist<=2
    supported — the SymSpell observation: two terms are within edit
    distance d iff they share a variant obtained by <=d deletions
    from each, so a join on variants finds every candidate pair
    without comparing all terms."""
    base = F.col(term) if isinstance(term, str) else term
    n = F.length(base)
    del1 = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            base.substr(F.lit(1), i - 1), base.substr(i + 1, n)
        ),
    )
    out = F.concat(F.array(base), del1)
    if max_dist >= 2:
        del2 = F.flatten(
            F.transform(
                del1,
                lambda s: F.transform(
                    F.sequence(F.lit(1), F.length(s)),
                    lambda i: F.concat(
                        s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
                    ),
                ),
            )
        )
        out = F.concat(out, del2)
    return F.array_distinct(out)


def term_deletion_variants(
    terms: DataFrame, max_dist: int = 1, term_col: str = "term"
) -> DataFrame:
    """The materializable fuzzy index: (term, variant) for every
    deletion variant — write it partitioned/sorted by variant and
    fuzzy lookups become pruned scans."""
    return (
        terms.select(F.col(term_col).alias("term"))
        .distinct()
        .select(
            "term",
            F.explode(_deletion_variants_expr("term", max_dist)).alias(
                "variant"
            ),
        )
    )


def fuzzy_term_match(
    terms: DataFrame,
    query: str,
    max_dist: int = 1,
    term_col: str = "term",
    variants: DataFrame | None = None,
) -> DataFrame:
    """Vocabulary terms within Levenshtein distance ``max_dist`` of
    ``query`` (typo-tolerant lookup for search-as-you-type / query
    correction).  Returns (term, distance), exact-verified.

    Scale shape (SymSpell): the vocabulary side explodes into its
    deletion variants ONCE (materializable as the fuzzy index, size
    O(|vocab| * avg_len^max_dist)); the query's variants are a tiny
    driver-side IN-list that pushes into the variant scan, so lookup
    cost is proportional to candidates sharing a variant — never a
    full-vocabulary Levenshtein scan.  The final
    ``levenshtein() <= max_dist`` verify runs on candidates only
    (deletion sharing is necessary, not sufficient)."""
    if not query:
        raise ValueError("empty query")
    qv = {query}
    for _ in range(max_dist):
        qv |= {v[:i] + v[i + 1 :] for v in list(qv) for i in range(len(v))}
    var = (
        variants
        if variants is not None
        else term_deletion_variants(terms, max_dist, term_col)
    )
    cands = (
        var.filter(F.col("variant").isin(sorted(qv)))
        .select("term")
        .distinct()
    )
    return (
        cands.select(
            "term", F.levenshtein(F.col("term"), F.lit(query)).alias("distance")
        )
        .filter(F.col("distance") <= max_dist)
    )


def prefix_terms(
    terms: DataFrame, prefix: str, term_col: str = "term"
) -> DataFrame:
    """Vocabulary terms starting with ``prefix`` (wildcard ``pre*``
    lookup).  startswith compiles to a [prefix, prefix+0xFF) range on a
    term-sorted/partitioned lexicon — file-pruning at scale, which is
    how the merged index's term-range pushdown already serves Q2."""
    if not prefix:
        raise ValueError("empty prefix")
    return (
        terms.select(F.col(term_col).alias("term"))
        .distinct()
        .filter(F.col("term").startswith(prefix))
    )


def doc_term_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (doc_id, t) pairs — the materializable doc-term index
    behind :func:`related_terms` (and any doc-level co-occurrence op).
    At scale, write it once partitioned/sorted by ``t`` so per-term
    lookups prune files, exactly like ``char_trigram_postings``."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("t"),
    )


def term_dfs(doc_terms: DataFrame) -> DataFrame:
    """Global (t, df) document frequencies from a doc-term frame —
    the second stored artifact ``related_terms`` consumes."""
    return doc_terms.groupBy("t").agg(
        F.count("*").cast("long").alias("df")
    )


def related_terms(
    docs: DataFrame | None,
    term: str,
    k: int = 20,
    min_co_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_terms: DataFrame | None = None,
    dfs: DataFrame | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Query-expansion candidates: terms co-occurring with ``term``
    (doc-level), ranked by a PMI-style association score
    ``log2(co_df * N / (df_term * df_other))`` rounded to 6, ties by
    term.  Columns: term, co_df, df, pmi.

    Scale shape: the expensive side is restricted FIRST — only docs
    containing the query term explode their vocabularies (a semi-join
    against the term's posting docs, never the whole corpus), and the
    per-term dfs come from a count over distinct (doc, term) pairs of
    that restricted set joined to global dfs.

    The corpus-wide inputs are all injectable, mirroring
    ``substring_search(trigrams=...)``: pass a materialized
    ``doc_terms`` (:func:`doc_term_postings`), ``dfs``
    (:func:`term_dfs`), and ``n_docs`` (from the build's stats table)
    and NO corpus-wide job runs at query time — ``docs`` may then be
    ``None`` (pinned in tests/test_textsearch.py), so an accidental
    corpus scan is structurally impossible.  Ad hoc (artifacts omitted)
    each is derived from ``docs`` as before."""
    if doc_terms is None:
        if docs is None:
            raise ValueError("need docs when doc_terms is not supplied")
        doc_terms = doc_term_postings(docs, text_col=text_col, id_col=id_col)
    toks = doc_terms.select("doc_id", "t")
    if n_docs is None:
        if docs is None:
            raise ValueError("need docs or n_docs")
        n_docs = docs.select(id_col).distinct().count()
    if dfs is None:
        dfs = term_dfs(toks)
    with_term = toks.filter(F.col("t") == term).select("doc_id")
    # df_term is one row of the dfs artifact — a pruned lookup, not a
    # posting scan, when dfs is a stored table
    df_row = dfs.filter(F.col("t") == term).select("df").collect()
    df_term = int(df_row[0]["df"]) if df_row else 0
    if df_term == 0:
        return (
            toks.limit(0)
            .select(
                F.col("t").alias("term"),
                F.lit(0).cast("long").alias("co_df"),
                F.lit(0).cast("long").alias("df"),
                F.lit(0.0).alias("pmi"),
            )
        )
    co = (
        toks.join(with_term, "doc_id", "left_semi")
        .filter(F.col("t") != term)
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("co_df"))
        .filter(F.col("co_df") >= min_co_df)
    )
    return (
        co.join(dfs, "t")
        .select(
            F.col("t").alias("term"),
            "co_df",
            "df",
            F.round(
                F.log2(
                    F.col("co_df")
                    * F.lit(float(n_docs))
                    / (F.lit(float(df_term)) * F.col("df"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("term"))
        .limit(k)
    )


def char_trigram_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(trigram, doc_id) — DISTINCT character 3-grams per doc
    (case-sensitive: substring search is exact-match).  Docs shorter
    than 3 chars emit nothing."""
    grams = F.when(
        F.length(text_col) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(text_col) - 2),
            lambda i: F.col(text_col).substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(grams)).alias("trigram"),
    )


def substring_search(
    docs: DataFrame,
    needle: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigrams: DataFrame | None = None,
) -> DataFrame:
    """Exact substring search: (doc_id, n_occurrences) for docs whose
    text contains ``needle`` (non-overlapping count, replace
    semantics).  With a pre-built ``char_trigram_postings`` frame (the
    STORED index) and a >=3-char needle, the scan is restricted to
    candidate docs holding ALL the needle's distinct trigrams (posting
    intersection with the probe trigrams pushed into the index scan).

    Without a stored index the verify scan runs directly (r8): building
    a trigram index on the fly reads + explodes the ENTIRE corpus just
    to pre-filter a corpus the verify then scans anyway — strictly more
    work than the one `contains` pass it tried to save, at every scale
    (measured 2.5 s vs 0.25 s at sf0.1, identical results)."""
    if not needle:
        raise ValueError("empty needle")
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    if trigrams is not None and len(needle) >= 3:
        need = sorted({needle[i : i + 3] for i in range(len(needle) - 2)})
        cands = (
            trigrams.filter(F.col("trigram").isin(need))
            .groupBy("doc_id")
            .agg(F.count("*").alias("_nt"))
            .filter(F.col("_nt") == len(need))
            .select("doc_id")
        )
        base = base.join(cands, "doc_id", "left_semi")
    n_occ = (
        (F.length("_t") - F.length(F.replace(F.col("_t"), F.lit(needle))))
        / F.lit(len(needle))
    ).cast("long")
    return (
        base.filter(F.contains(F.col("_t"), F.lit(needle)))
        .select("doc_id", n_occ.alias("n_occurrences"))
    )
