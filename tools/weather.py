"""Settled-host gate for official bench windows — the committed form of
the bank-early discipline (VERDICT r12 #2 / COVERAGE r12 "bank settled
windows EARLY").

The bench's host_shift classifier compares the run's three calibration
probes (parallel / serial / python, bench.py) against the latest
official driver round's row; any probe axis >1.05 excludes the window
from band evidence. r12 and r13 both needed to TIME official windows to
settled weather, and both rounds improvised the sampling (r12: repeated
sf0.001 bench runs; r13: a shell loop around probe_queries) — this tool
is that sampler as committed machinery:

    python tools/weather.py                 # one sample, verdict on stdout
    python tools/weather.py --watch 300     # sample every 300 s, exit 0
                                            # on the first settled read
    python tools/weather.py --watch 300 --max-samples 24
                                            # give up (exit 1) after 24

so an official window can be gated mechanically:

    python tools/weather.py --watch 300 && python bench.py

Each sample is ONE JSON line: the three probe values, their ratios to
the official baseline (the SAME baseline bench.py's host_shift uses, so
a `settled: true` here predicts a <=1.05 classification there), and the
verdict. The sf0.001 full-bench probe stays useful for a query-level
read; this tool is for the tight sample-until-settled loop where a
~40 s calibration-only session beats a ~3 min full probe.

Caveats (measured, not guessed): the parallel probe is sampled in a
FRESH session here vs the end of a ~30-min session in bench.py — on
this box class the fresh-session read sits a few hundredths high, so
the default threshold leaves the parallel axis advisory (reported,
never gating) unless --strict includes it. The serial and python axes
are session-depth-insensitive (single task / fixed worker dispatch) and
gate by default.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SETTLED_FACTOR = 1.05  # bench.host_shift_factor's noise threshold


def classify(now: dict, prev: dict, factor: float = SETTLED_FACTOR, strict: bool = False) -> dict:
    """Pure verdict over one calibration sample. ``now``/``prev`` map axis
    name -> probe seconds (missing/None axes contribute no ratio, same as
    host_shift_factor's partial-baseline handling). Gating axes: serial +
    python; parallel joins only under ``strict`` (see module docstring).
    Returns {"ratios": {axis: r}, "settled": bool, "worst": (axis, r)}."""
    ratios = {
        axis: round(now[axis] / prev[axis], 3)
        for axis in ("parallel", "serial", "python")
        if now.get(axis) and prev.get(axis)
    }
    gating = {a: r for a, r in ratios.items() if strict or a != "parallel"}
    worst = max(gating.items(), key=lambda kv: kv[1]) if gating else None
    return {
        "ratios": ratios,
        "settled": bool(gating) and all(r <= factor for r in gating.values()),
        "worst": worst,
    }


def sample(spark) -> dict:
    import bench

    return {
        "parallel": bench.bench_calibration(spark),
        "serial": bench.bench_calibration_serial(spark),
        "python": bench.bench_calibration_python(spark),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", type=int, metavar="SECONDS", help="re-sample until settled")
    ap.add_argument("--max-samples", type=int, default=48)
    ap.add_argument("--factor", type=float, default=SETTLED_FACTOR)
    ap.add_argument("--strict", action="store_true", help="gate on the parallel axis too")
    ap.add_argument("--sf", type=float, default=0.1, help="official-baseline SF to compare against")
    args = ap.parse_args()

    import bench
    from jetstream_spark.session import get_spark

    prev = bench._prev_calibration(args.sf)
    if not any(prev.values() if prev else ()):
        print(json.dumps({"error": f"no official baseline at sf={args.sf}"}))
        return 2
    spark = get_spark("weather")
    try:
        for i in range(args.max_samples if args.watch else 1):
            now = sample(spark)
            verdict = classify(now, prev, args.factor, args.strict)
            line = {
                "wall_clock": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "now": now,
                "baseline": prev,
                **verdict,
            }
            print(json.dumps(line), flush=True)
            if verdict["settled"]:
                return 0
            if not args.watch:
                return 1
            if i < args.max_samples - 1:
                time.sleep(args.watch)
    finally:
        spark.stop()
    return 1  # watch exhausted without a settled read


if __name__ == "__main__":
    raise SystemExit(main())
