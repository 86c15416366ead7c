"""Bench instrumentation: host-speed canaries + JVM read-byte meters.

Shared by bench.py / scripts/bench_bmw.py / scripts/bench_scaling.py so
every benchmark reports the same three calibration signals:

1. ``cpu_canary``       — single-thread sha256 loop (VERDICT r4 #5):
   divides host speed out of cross-round comparisons.
2. ``cpu_canary_mt``    — the SAME per-thread workload on N threads
   (VERDICT r6 #1): this VM throttles above ~16 busy cores, which the
   single-thread canary is blind to; the ratio mt/single is the
   multi-core throttle factor a local[32] wall time actually runs
   under.  hashlib releases the GIL, so threads suffice.
3. ``JvmIOMeter``       — per-query BYTES READ (VERDICT r6 #2).  Spark
   task ``inputMetrics.bytesRead`` is blind here: it is fed from
   Hadoop FileSystem thread statistics, and Spark 4's vectorized
   parquet reader on ``file:`` reads data pages through java.nio,
   bypassing them (measured: an 8.1 MB parquet scan registers 21 KB —
   footers only — in ``AppStatusStore.stageList`` inputBytes AND in
   ``FileSystem.getGlobalStorageStatistics``).  So we meter at the
   layer that cannot be bypassed: the JVM process's ``/proc/<pid>/io``
   — ``rchar`` (logical bytes through read syscalls) and
   ``read_bytes`` (physical block-device bytes: what a COLD read
   actually pulls — ~0 on a warm cache).  In local mode driver ==
   executors == one JVM, so its deltas are the engine's reads.
   INTERPRETATION (corrected r7 after the isolate experiment in
   BENCH/SCALE.md): rchar counts reads on EVERY fd, sockets included,
   and for query paths that decode through mapInPandas the Arrow
   stream python->JVM DOMINATES it (measured at 30M docs: a
   full-decode OR reads a 56 MB term payload from a 1.7 GB table yet
   shows 1.8 GB rchar — the decoded-postings Arrow frames).  So:
   rchar = total bytes MOVED (storage + IPC + shuffle re-reads), a
   deterministic work measure that is stable across host drift
   (±0.1 % across the r7 adjudication runs) but NOT a storage-GET
   count; ``read_bytes`` under a dropped page cache (--cold) is the
   honest object-storage-GET analog for pruning claims.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import time


def cpu_canary(reps: int = 3) -> float:
    """Fixed pure-CPU workload (sha256 over a constant 512 MB stream),
    single-threaded, min-of-``reps`` seconds."""
    buf = b"\x5a" * (1 << 20)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for _ in range(512):
            h.update(buf)
        h.digest()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def cpu_canary_mt(threads: int = 8, reps: int = 3) -> float:
    """The same 512 MB sha256 workload run CONCURRENTLY on ``threads``
    threads; returns the min-of-reps wall seconds for all threads to
    finish.  On an unthrottled host this ~equals the single-thread
    canary (each thread does the same work on its own core); the ratio
    mt/single rises as the hypervisor throttles multi-core load — the
    signal the single-thread canary cannot see (BENCH/SCALE.md r6:
    >16 busy cores throttle on this VM)."""
    from concurrent.futures import ThreadPoolExecutor

    buf = b"\x5a" * (1 << 20)

    def work(_):
        h = hashlib.sha256()
        for _ in range(512):
            h.update(buf)
        return h.digest()

    best = float("inf")
    with ThreadPoolExecutor(max_workers=threads) as ex:
        for _ in range(reps):
            t0 = time.perf_counter()
            list(ex.map(work, range(threads)))
            best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _descendant_java_pids() -> list[int]:
    """PIDs of java processes descended from this python process (the
    py4j-launched local-mode JVM, possibly several across sessions)."""
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,ppid,comm"], capture_output=True, text=True
        ).stdout
    except OSError:
        return []
    procs: dict[int, tuple[int, str]] = {}
    for ln in out.strip().splitlines()[1:]:
        parts = ln.split(None, 2)
        if len(parts) == 3:
            try:
                procs[int(parts[0])] = (int(parts[1]), parts[2])
            except ValueError:
                pass
    me = os.getpid()

    def descends(pid: int) -> bool:
        seen: set[int] = set()
        while pid and pid not in seen and (pid in procs or pid == me):
            if pid == me:
                return True
            seen.add(pid)
            pid = procs[pid][0]
        return False

    return [p for p, (_pp, comm) in procs.items()
            if "java" in comm and descends(p)]


class JvmIOMeter:
    """Read-byte deltas of the session JVM via /proc/<pid>/io.

    ``snapshot()`` returns cumulative {rchar, read_bytes}; ``delta()``
    returns the difference since the last snapshot AND re-snapshots, so
    a bench loop brackets each query with one call.  Returns zeros when
    /proc is unavailable (non-Linux) — callers emit 0 rather than
    crash."""

    def __init__(self) -> None:
        self.pids = _descendant_java_pids()
        self._last = self.snapshot()

    def snapshot(self) -> dict[str, int]:
        tot = {"rchar": 0, "read_bytes": 0}
        for p in self.pids:
            try:
                with open(f"/proc/{p}/io") as f:
                    for ln in f:
                        k, _, v = ln.partition(":")
                        if k in tot:
                            tot[k] += int(v)
            except OSError:
                pass
        return tot

    def delta(self) -> dict[str, int]:
        now = self.snapshot()
        out = {k: max(0, now[k] - self._last[k]) for k in now}
        self._last = now
        return out


def drop_page_cache() -> bool:
    """Best-effort cold-read simulation: sync + drop the OS page cache
    (needs root / a writable /proc/sys/vm/drop_caches — true in this
    sandbox, false on most shared hosts).  Returns success."""
    try:
        subprocess.run(["sync"], check=True, timeout=120)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (OSError, subprocess.SubprocessError):
        return False
