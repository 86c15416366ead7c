"""The rank-identity bench's query-set builder (scripts/
bench_rank_identity.py) must be deterministic and cover the reference
query classes (single/multi-term, both strata ends, duplicates,
unknown terms, D5 truncation candidates when the lexicon has any)."""

import os
import sys

from tests.oracle_util import CorpusOracle

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
from bench_rank_identity import build_query_set  # noqa: E402


def test_query_set_deterministic_and_class_complete():
    oracle = CorpusOracle(300)
    qs1 = build_query_set(oracle)
    qs2 = build_query_set(oracle)
    assert qs1 == qs2, "query set must be deterministic"
    assert len(qs1) >= 25
    n_terms = [len(q.split()) for q in qs1]
    assert 1 in n_terms and 2 in n_terms and max(n_terms) >= 3
    # duplicate-term weights query (reference query.c duplicate handling)
    assert any(len(q.split()) == 2 and len(set(q.split())) == 1 for q in qs1)
    # unknown-term queries: one mixed, one all-unknown
    assert any("zzznotinlexicon" in q and len(q.split()) == 2 for q in qs1)
    assert "zzznotinlexicon qqqneitherthisone" in qs1
    # every non-synthetic term really is in the lexicon
    for q in qs1:
        for t in q.split():
            if not t.startswith(("zzz", "qqq")):
                assert t in oracle.postings, (q, t)
