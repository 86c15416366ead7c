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


def gen_corpus(n_docs: int, path: str, token_range=(200, 1601)) -> None:
    """Bench corpus: source-file-sized docs (the fixture's 5-400-token
    profile is for oracle corpora; bigger docs put the bench where a
    real corpus is — compute-bound tokenize/encode, not per-row IO)."""
    from invertedindexbuilder_spark.session import get_spark
    from invertedindexbuilder_spark.sources.docs_src import synthetic_docs_src

    spark = get_spark(app_name="gen-corpus", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    synthetic_docs_src(
        spark, n_docs, num_partitions=64, token_range=token_range
    ).write.mode("overwrite").parquet(path)
    spark.stop()


def run_build(cores: int, corpus: str, zpath: str, tokenizer: str = "pandas") -> dict:
    out = os.path.join(WORK, f"idx_{cores}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    proc = subprocess.run(
        [
            # pin the WHOLE process tree (JVM shuffle/GC threads +
            # python workers) to exactly N cpus: local[N] alone bounds
            # task slots but the JVM happily uses extra cores, which
            # would let the small config overdraw its share and
            # understate true scaling
            "taskset", "-c", f"0-{cores - 1}",
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
            "--tokenizer", tokenizer,
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
    ap.add_argument("--tokenizer", choices=["arrow", "pandas", "jvm"], default="arrow")
    ap.add_argument("--no-md", action="store_true",
                    help="print JSON only, don't rewrite BENCH/BASELINE.md")
    ap.add_argument("--reps", type=int, default=1,
                    help="back-to-back pinned pairs (VERDICT r4 #6: one "
                         "pair is inside this VM's ±15%% noise band; "
                         "median-of-5 is the reportable number)")
    ap.add_argument("--canary-band", type=float, default=1.10,
                    help="quiet-window gate (VERDICT r6 #7): a pair is "
                         "RECORDED only if (a) its start and end "
                         "canaries are within this factor of EACH "
                         "OTHER (no load drift inside the pair — the "
                         "efficiency is a ratio measured across ~15 "
                         "min) and (b) both are within this factor of "
                         "the session's MEDIAN canary (host in its "
                         "typical state).  The anchor is the median, "
                         "not the minimum: a single anomalously-fast "
                         "sample must not tighten the band for the "
                         "whole session (the first r7 campaign burned "
                         "its whole discard budget that way — every "
                         "discarded pair's canaries sat within 1.05x "
                         "of the session median).  Noisier pairs are "
                         "discarded and rerun (count disclosed)")
    ap.add_argument("--max-discards", type=int, default=4,
                    help="rerun budget for noisy pairs; exhausted -> "
                         "remaining pairs record with quiet=false flags")
    ap.add_argument("--n", type=int, default=4,
                    help="small parallelism (large = 4x this). Default "
                         "4 vs 16: this VM's aggregate clock throttles "
                         "above ~16 busy cores (measured 3.3x at 8->32 "
                         "procs for raw CPU), which would contaminate a "
                         "local[8]-vs-local[32] SPARK measurement.")
    args = ap.parse_args()

    os.makedirs(WORK, exist_ok=True)
    corpus = os.path.join(WORK, f"corpus_{args.docs}")
    if not args.skip_gen or not os.path.exists(corpus):
        sys.path.insert(0, REPO)
        gen_corpus(args.docs, corpus)
    zpath = make_zip()

    # host-speed canary bracketing every pair (same fixed sha256 loop
    # as bench.py): the quiet-window gate (VERDICT r6 #7) makes the
    # memory'd "scaling runs need a quiet machine" rule EXECUTABLE —
    # instead of explaining outliers after the fact, a pair whose
    # start or end canary falls outside --canary-band of the session's
    # fastest canary is discarded and rerun, and the discard count is
    # disclosed in the output and the md table
    sys.path.insert(0, REPO)
    from invertedindexbuilder_spark.benchmetrics import (
        cpu_canary as _cpu_canary,
    )

    def _median(xs: list) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    pairs = []
    discarded = []
    # 3-sample calibration seeds the median anchor so the first pair's
    # gate isn't anchored on its own two samples
    canaries = [_cpu_canary() for _ in range(3)]
    want = max(1, args.reps)
    while len(pairs) < want:
        c0 = _cpu_canary()
        r8 = run_build(args.n, corpus, zpath, args.tokenizer)
        r32 = run_build(args.n * 4, corpus, zpath, args.tokenizer)
        c1 = _cpu_canary()
        canaries += [c0, c1]
        anchor = _median(canaries)
        quiet = (
            max(c0, c1) <= args.canary_band * min(c0, c1)
            and max(c0, c1) <= args.canary_band * anchor
        )
        e = r32["docs_per_sec"] / (4.0 * r8["docs_per_sec"])
        pair = {"rep": len(pairs), "canary_sec": c0,
                "canary_sec_end": c1, "quiet": quiet, "small": r8,
                "large": r32, "eff": round(e, 3)}
        budget_left = len(discarded) < args.max_discards
        if not quiet and budget_left:
            discarded.append(pair)
            print(json.dumps({"discarded": True, "eff": pair["eff"],
                              "canary_start": c0, "canary_end": c1,
                              "anchor": round(anchor, 4),
                              "band_max": round(
                                  args.canary_band * anchor, 4)}),
                  file=sys.stderr)
            continue
        pairs.append(pair)
        print(json.dumps({"rep": pair["rep"], "eff": pair["eff"],
                          "canary_sec": c0, "canary_sec_end": c1,
                          "quiet": quiet,
                          "small_dps": r8["docs_per_sec"],
                          "large_dps": r32["docs_per_sec"]}),
              file=sys.stderr)
    effs = sorted(p["eff"] for p in pairs)
    med = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
    )
    # headline pair = the median-efficiency one (representative, not
    # cherry-picked best)
    headline = min(pairs, key=lambda p: abs(p["eff"] - med))
    r8, r32, eff = headline["small"], headline["large"], headline["eff"]
    result = {
        "docs": args.docs,
        "tokenizer": args.tokenizer,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": med,
        "scaling_efficiency_pairs": [p["eff"] for p in pairs],
        "canary_secs": [p["canary_sec"] for p in pairs],
        "canary_band": args.canary_band,
        "canary_anchor": round(_median(canaries), 4),
        "discarded_pairs": len(discarded),
        "discarded_effs": [p["eff"] for p in discarded],
        "nonquiet_recorded": sum(1 for p in pairs if not p["quiet"]),
    }
    print(json.dumps(result))
    if args.no_md:
        return 0

    n, n4 = args.n, args.n * 4
    pairs_md = "\n".join(
        f"| {p['rep'] + 1} | {p['canary_sec']} | {p['canary_sec_end']} | "
        f"{'yes' if p['quiet'] else 'NO'} | "
        f"{p['small']['docs_per_sec']} | {p['large']['docs_per_sec']} | "
        f"{p['eff']:.3f} |"
        for p in pairs
    )
    disc_effs = ", ".join("{:.3f}".format(p["eff"]) for p in discarded)
    n_nonquiet = sum(1 for p in pairs if not p["quiet"])
    anchor = _median(canaries)
    disc_md = (
        f"Quiet-window gate: a pair records only if its start and end "
        f"canary are within {args.canary_band:.2f}x of each other AND "
        f"of the session's median canary ({anchor:.4f} s over "
        f"{len(canaries)} samples; the median — not the minimum — so "
        f"one fast sample cannot tighten the band for the whole "
        f"session); **{len(discarded)} "
        f"pair(s) discarded and rerun** under that band"
        + (f" (discarded efficiencies: {disc_effs})" if discarded else "")
        + (f"; rerun budget exhausted — {n_nonquiet} recorded pair(s) "
           f"are flagged non-quiet" if n_nonquiet else "")
        + "."
    )
    md = f"""# BENCH/BASELINE — measured numbers (this engine)

## Scaling efficiency (north-rule criterion, N vs 4N parallelism)

No real cluster exists in this sandbox, so per the driver instruction the
SAME `spark-submit --py-files engine.zip scripts/build_index.py` job ran at
two parallelism levels on the same parquet corpus
({args.docs:,} synthetic source-code docs, FIXTURES.md generator, seed 42,
200-1600 tokens/doc):

| parallelism | build wall (s) | docs/sec | total incl. JVM startup (s) |
|---|---|---|---|
| local[{n}]  | {r8['wall_s']} | {r8['docs_per_sec']} | {r8['wall_total_s']} |
| local[{n4}] | {r32['wall_s']} | {r32['docs_per_sec']} | {r32['wall_total_s']} |

**Scaling efficiency = throughput(local[{n4}]) / (4 x throughput(local[{n}]))
= {eff:.3f}** (target >= 0.8; headline row = the median pair below).

All {len(pairs)} back-to-back pinned pair(s) (VERDICT r4 #6 — one pair sits
inside this VM's noise band; the canary is benchmetrics' fixed
single-thread sha256 loop, smaller = faster host at that moment,
bracketing each pair at start AND end):

| pair | canary start (s) | canary end (s) | quiet | local[{n}] docs/s | local[{n4}] docs/s | efficiency |
|---|---|---|---|---|---|---|
{pairs_md}

{disc_md}

**Median efficiency = {med:.3f}**, spread {effs[0]:.3f}-{effs[-1]:.3f}.

Measurement notes:
- Each run is PINNED to exactly its core count with `taskset -c 0-N-1`
  (JVM shuffle/GC threads included): bare local[N] bounds task slots
  but not the JVM's machine share, letting the small config overdraw
  cores and understate true scaling.
- Pair chosen as local[{n}] vs local[{n4}]: this VM throttles aggregate
  clock above ~16 busy cores (raw 32-process Python CPU measures only
  3.3x an 8-process run, i.e. a 0.83 HARDWARE ceiling for 8-vs-32),
  so 8-vs-32 would measure the hypervisor, not the engine.  At
  {n}-vs-{n4} the raw-CPU capacity ratio of this box measures 3.8/4.
- Corpus sized so the local[{n}] build runs >= 60 s; a warm-up job
  (python workers + shuffle machinery on every slot) runs before the
  clock starts at BOTH parallelism levels.
- Skew salting is adaptive (postings-share threshold, capped at 1M):
  head terms are doc-range-chunked so no single term serializes the
  encode stage at low parallelism.

Index stats: {r8['terms']:,} terms, {r8['postings']:,} postings,
{r8['payload_bytes']:,} payload bytes.

## Reference comparison

The reference C engine built MS MARCO at ~908 docs/s end-to-end
(single-threaded, 22 GB corpus — BASELINE.md).  This engine at local[{n4}]
builds {r32['docs_per_sec']:,.0f} docs/s on the synthetic corpus
({r32['docs_per_sec']/908:.1f}x the reference's single-node rate; corpora
differ in doc size, so the scaling ratio above is the load-bearing number).

Per-round operator timings live in `BENCH_r*.json` (driver-run `bench.py`).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    mdpath = os.path.join(REPO, "BENCH", "BASELINE.md")
    # preserve hand-written sections (e.g. the driver-local latency
    # table, r6) across rewrites: splice any section between the
    # scaling block and '## Reference comparison' back in
    if os.path.exists(mdpath):
        with open(mdpath) as f:
            old = f.read()
        start = old.find("## Driver-local query latency")
        if start != -1:
            end = old.find("## Reference comparison", start)
            kept = old[start:end] if end != -1 else old[start:]
            md = md.replace(
                "## Reference comparison", kept + "## Reference comparison", 1
            )
    with open(mdpath, "w") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
