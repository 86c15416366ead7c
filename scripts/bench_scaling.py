"""Scaling-efficiency evidence (north rule: throughput efficiency >=0.8
between N and 4N executors; no real cluster in this sandbox, so the
same spark-submit --py-files build runs at local[8] and local[32] on
the same parquet input — see BASELINE.md).

    python scripts/bench_scaling.py [--docs 120000] [--skip-gen]

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/iib_scaling"


def make_zip() -> str:
    zpath = os.path.join(WORK, "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "invertedindexbuilder_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def gen_corpus(n_docs: int, path: str) -> None:
    from invertedindexbuilder_spark.session import get_spark
    from invertedindexbuilder_spark.sources.docs_src import synthetic_docs_src

    spark = get_spark(app_name="gen-corpus", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    synthetic_docs_src(spark, n_docs, num_partitions=64).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def run_build(cores: int, corpus: str, zpath: str) -> dict:
    out = os.path.join(WORK, f"idx_{cores}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--driver-memory", "24g",
            "--conf", f"spark.sql.shuffle.partitions={max(cores * 2, 16)}",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.files.maxPartitionBytes=8m",
            "--conf", "spark.sql.adaptive.advisoryPartitionSizeInBytes=8m",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "scripts", "build_index.py"),
            "--input", corpus,
            "--out", out,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=WORK,
    )
    wall_total = time.time() - t0
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not line:
        print(proc.stdout[-2000:], file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"build at local[{cores}] failed")
    metrics = json.loads(line[-1])
    metrics["wall_total_s"] = round(wall_total, 2)
    metrics["cores"] = cores
    return metrics


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    os.makedirs(WORK, exist_ok=True)
    corpus = os.path.join(WORK, f"corpus_{args.docs}")
    if not args.skip_gen or not os.path.exists(corpus):
        sys.path.insert(0, REPO)
        gen_corpus(args.docs, corpus)
    zpath = make_zip()

    r8 = run_build(8, corpus, zpath)
    r32 = run_build(32, corpus, zpath)
    eff = r32["docs_per_sec"] / (4.0 * r8["docs_per_sec"])
    result = {
        "docs": args.docs,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE — measured numbers (this engine)

## Scaling efficiency (north-rule criterion, N vs 4N parallelism)

No real cluster exists in this sandbox, so per the driver instruction the
SAME `spark-submit --py-files engine.zip scripts/build_index.py` job ran at
two parallelism levels on the same parquet corpus
({args.docs:,} synthetic source-code docs, FIXTURES.md generator, seed 42):

| parallelism | build wall (s) | docs/sec | total incl. JVM startup (s) |
|---|---|---|---|
| local[8]  | {r8['wall_s']} | {r8['docs_per_sec']} | {r8['wall_total_s']} |
| local[32] | {r32['wall_s']} | {r32['docs_per_sec']} | {r32['wall_total_s']} |

**Scaling efficiency = throughput(local[32]) / (4 x throughput(local[8]))
= {eff:.3f}** (target >= 0.8).

Corpus sized so the local[8] build takes >= 60 s (amortizes session
startup).  Index stats: {r8['terms']:,} terms, {r8['postings']:,} postings,
{r8['payload_bytes']:,} payload bytes.

## Reference comparison

The reference C engine built MS MARCO at ~908 docs/s end-to-end
(single-threaded, 22 GB corpus — BASELINE.md).  This engine at local[32]
builds {r32['docs_per_sec']:,.0f} docs/s on the synthetic corpus
({r32['docs_per_sec']/908:.1f}x the reference's single-node rate; corpora
differ in doc size, so the scaling ratio above is the load-bearing number).

Per-round operator timings live in `BENCH_r*.json` (driver-run `bench.py`).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
