"""Host-ceiling probe for the paired scaling protocol.

Runs the pure-Python extraction kernel (``oracle.process_page`` — no Spark,
no Arrow, no JVM) over the same corpus rows in N taskset-pinned processes
and prints one JSON line ``{"nproc": N, "pages": P, "sec": S, "rate": R}``.

Purpose: the sandbox host's 4→16-core scaling is itself regime-dependent
(measured the same probe at 0.958 in a clean window and 0.62 under
co-tenant memory-bandwidth pressure, with steal% near zero both times).
Running this probe at both levels alongside every engine pair yields a
per-pair HOST CEILING — the best scaling any computation could achieve in
that window — so the engine's per-pair efficiency can be read relative to
what the box physically delivered, not relative to an ideal 4× the host
was not offering.

Usage: python BENCH/kernel_probe.py <nproc> <corpus_parquet_glob> [rows]
"""

from __future__ import annotations

import datetime
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TS = datetime.datetime(2021, 3, 1)


def _worker(rows):
    from frontier_engine import oracle

    n = 0
    for url, html in rows:
        oracle.process_page(url, _TS, html)
        n += 1
    return n


def _load_rows(glob: str, k: int):
    import duckdb

    con = duckdb.connect()
    rs = con.sql(
        f"SELECT url, html FROM parquet_scan('{glob}') LIMIT {k}"
    ).fetchall()
    return [(r[0], bytes(r[1])) for r in rs]


def main() -> None:
    nproc = int(sys.argv[1])
    glob = sys.argv[2]
    per = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    rows = _load_rows(glob, per)
    os.sched_setaffinity(0, set(range(nproc)))  # children inherit the mask
    with mp.Pool(nproc) as pool:
        pool.map(_worker, [rows[:40]] * nproc)  # warmup (imports, JIT-ish)
        t0 = time.perf_counter()
        done = sum(pool.map(_worker, [rows] * nproc))
        sec = time.perf_counter() - t0
    print(json.dumps(
        {"nproc": nproc, "pages": done, "sec": round(sec, 2), "rate": round(done / sec, 1)}
    ))


if __name__ == "__main__":
    main()
