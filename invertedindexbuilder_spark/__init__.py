"""PySpark-native inverted-index build + BM25 query engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference C engine ``baoziiiii/InvertedIndexBuilder`` (see SURVEY.md):

- parse -> sort -> merge -> final-build index pipeline  ==>  one narrow
  tokenize stage + ONE range-repartition shuffle + a streaming block
  encoder (``plans.build``),
- top-k BM25 conjunctive/disjunctive query               ==>  set-oriented
  DataFrame scoring with block-pruned decode (``operators.query_exec``).

All heavy row work is vectorized (pandas/Arrow UDFs, numpy codecs); no
per-row Python in the hot path.
"""

__version__ = "0.1.0"

BLOCK_SIZE = 128  # postings per compressed block (reference model.h:87)
WORD_LENGTH_MIN = 1  # reference lexicon.h:8
WORD_LENGTH_MAX = 15  # reference lexicon.h:9
LEXICON_KEY_LEN = 14  # query-side key truncation (reference lexicon.c:56, query.c:251)
BM25_K1 = 1.2  # reference query.c:82
BM25_B = 0.75  # reference query.c:83
