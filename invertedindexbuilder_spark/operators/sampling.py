"""Deterministic stratified sampling — the training-data MIXING
primitive: keep each stratum (language, source domain, quality bucket)
at its own rate, reproducibly.

``df.sampleBy`` is seeded per partition and NOT stable across partition
counts or engines; a training pipeline needs the mix decision to be a
pure function of the ROW, so the keep test here is a hash threshold:
``hash(key) mod M < rate * M``.  Pure column expressions (JVM,
whole-stage codegen), no shuffle, identical in DuckDB SQL — which is
what makes the gate oracle possible and re-runs byte-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from invertedindexbuilder_spark.functions.text import hash32

_MOD = 1_000_000


def stratified_keep_expr(
    key: Column, stratum: Column, rates: dict[str, float], default_rate: float = 0.0
) -> Column:
    """Boolean keep-column: row survives iff hash(key) lands under its
    stratum's rate threshold.  Rates are quantized to 1/1e6 so the SQL
    twin uses exact integer thresholds."""
    bucket = hash32(key) % F.lit(_MOD)
    thresh = F.lit(int(default_rate * _MOD))
    for name in sorted(rates):
        thresh = F.when(
            stratum == F.lit(name), F.lit(int(rates[name] * _MOD))
        ).otherwise(thresh)
    return bucket < thresh


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically
    (same rows kept on every run, any partitioning, any engine)."""
    return df.filter(
        stratified_keep_expr(
            F.col(key_col).cast("string"), F.col(stratum_col), rates, default_rate
        )
    )
