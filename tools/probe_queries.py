"""Settled-host probe of named queries: min-of-N wall times plus the three
calibration probes, as ONE JSON line — the committed-evidence format for
bench-flag attribution (VERDICT r8 #1: "weak until attributed with
committed evidence").

Usage:
    python tools/probe_queries.py [--sf-dir DIR] [--runs N] [--sf1] q1 q2 ...

--sf1 scales the base dir 10x first (bench.ensure_scaled_sf1) and probes
against the replica corpus — for sf1-variance attribution runs
(e.g. label_propagation, VERDICT r8 #6).

Each query is preceded by a block-store release so it measures a clean
session (the bench's clean-retest discipline); calibration probes run
LAST so they sample the same host window the queries did.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf1", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    import bench
    from jetstream_spark.queries import all_queries
    from jetstream_spark.session import get_spark

    specs = all_queries()
    unknown = [q for q in args.queries if q not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("probe_queries")
    sf_dir = args.sf_dir
    if args.sf1:
        sf_dir = bench.ensure_scaled_sf1(spark, sf_dir)

    out: dict = {"sf_dir": sf_dir, "runs": args.runs, "queries": {}, "samples": {}}
    # session warmup: one unrecorded pass over every query first. The
    # bench measures inside a long-lived session (dozens of queries of
    # JIT/codegen/Arrow warmup before any flagged query runs); a fresh
    # session's first samples plateau cold 2x-8x on this box class and
    # would bias a min-of-N probe high.
    if not args.no_warmup:
        for name in args.queries:
            specs[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in args.queries:
        samples = []
        for _ in range(args.runs):
            bench._release_memory(spark)
            t0 = time.time()
            specs[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out["queries"][name] = min(samples)
        out["samples"][name] = samples
    # older checkouts (pre-r8) carry only the parallel probe — the tool
    # must run inside an A/B worktree of any round's code
    out["calibration_s"] = bench.bench_calibration(spark)
    for key, fn in (
        ("calibration_serial_s", "bench_calibration_serial"),
        ("calibration_python_s", "bench_calibration_python"),
    ):
        probe = getattr(bench, fn, None)
        out[key] = probe(spark) if probe else None
    out["wall_clock"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
