"""CLI-surface coverage for scripts/ann_cli.py (VERDICT r5 #5): the
trained (--kmeans) branch end-to-end — train-sample -> centroids ->
build, stored-table query, incremental compact, replay rejection —
driven through main() so the argument wiring itself is under test.
The suite's shared session is injected via a stop()-swallowing proxy
(the CLI stops the session it thinks it created)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _load_ann_cli():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ann_cli", os.path.join(here, "scripts", "ann_cli.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _SharedSession:
    def __init__(self, spark):
        self._spark = spark

    def __getattr__(self, name):
        return getattr(self._spark, name)

    def stop(self):  # keep the module-scoped session alive
        pass


@pytest.fixture()
def run_cli(spark, monkeypatch):
    mod = _load_ann_cli()
    import invertedindexbuilder_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda **kw: _SharedSession(spark))

    def run(*argv):
        monkeypatch.setattr(sys, "argv", ["ann_cli.py", *argv])
        assert mod.main() == 0

    return run


def test_kmeans_cli_build_query_compact_replay(
    spark, run_cli, tmp_path, capsys
):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base_p = str(tmp_path / "base.parquet")
    delta_p = str(tmp_path / "delta.parquet")
    emb.filter(F.col("vec_id") < 400).write.parquet(base_p)
    emb.filter(F.col("vec_id") >= 400).write.parquet(delta_p)
    root = str(tmp_path / "ann")

    # build: --kmeans trains on the lowest --train-sample ids
    run_cli("--input", base_p, "--out", root, "--build",
            "--kmeans", "4", "--train-sample", "100")
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["trained"] and info["n_vectors"] == 400

    # query through the CLI == the stored-serving API
    run_cli("--out", root, "--query-id", "0", "--k", "5", "--probes", "2")
    cli_rows = [
        (float(c), int(v))
        for c, v in (ln.split("\t") for ln in
                     capsys.readouterr().out.strip().splitlines())
    ]
    from invertedindexbuilder_spark.operators.similarity import (
        ann_topk_stored,
    )

    api_rows = [
        (round(float(r["cosine"]), 6), int(r["vec_id"]))
        for r in ann_topk_stored(
            spark, root, query_vec_id=0, k=5, n_probes=2
        ).collect()
    ]
    assert cli_rows == api_rows and len(cli_rows) == 5

    # incremental compact folds the delta under the frozen centroids
    run_cli("--input", delta_p, "--out", root, "--compact")
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_vectors"] == 500

    # replaying the same delta through the CLI is rejected
    with pytest.raises(ValueError, match="overlap"):
        run_cli("--input", delta_p, "--out", root, "--compact")
    capsys.readouterr()

    # --stats reports the store's operational facts in one JSON line
    run_cli("--out", root, "--stats")
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["n_vectors"] == 500 and st["trained"] is True
    assert st["n_tombstones"] == 0
    assert sum(st["cells"].values()) == 500 and len(st["cells"]) <= 4
