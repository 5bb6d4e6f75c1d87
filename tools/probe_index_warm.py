"""A/B probe for the bench's index-warm phase (BENCH_AB_r13_opt3).

The phase builds the three materialized indexes (ann_lsh_indexed,
ann_ivf_indexed, dedup_incremental) from a cold fingerprint; bench.py
reports its wall as `index_warm_build_s`. r13 overlapped the three
independent builds from a 3-thread pool (guide §2.6) so each build's
straggler tail is back-filled by the next build's tasks. This probe
measures one warm phase per FRESH process, invalidating the sf-tagged
index dirs first, in either mode:

    python tools/probe_index_warm.py --mode seq      # pre-r13 shape
    python tools/probe_index_warm.py --mode overlap  # r13 shape
    python tools/probe_index_warm.py --ab N          # N alternating
                                                     # windows per mode,
                                                     # JSON verdict

Alternating fresh-process windows over the same host weather, floors
compared — the committed probe_queries.py discipline, specialized to a
phase that tool cannot see (the warm happens before its timed region).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR_DEFAULT = "/root/testdata/sf0.1"
NAMES = ("ann_lsh_indexed", "ann_ivf_indexed", "dedup_incremental")


def _index_dirs(sf_dir: str) -> list[str]:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    tmp = tempfile.gettempdir()
    return [
        os.path.join(tmp, f"jetstream_ann_index_{tag}"),
        os.path.join(tmp, f"jetstream_ivf_index_{tag}"),
        os.path.join(tmp, f"jetstream_band_index_{tag.replace('.', '_')}"),
    ]


def run_once(mode: str, sf_dir: str) -> float:
    for d in _index_dirs(sf_dir):
        shutil.rmtree(d, ignore_errors=True)
    from jetstream_spark.queries import all_queries
    from jetstream_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("probe_index_warm")
    specs = all_queries()
    # same warmup bench.py gives the phase (JVM + codegen + parquet footers)
    specs["q1_pricing_summary"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def build(name: str) -> None:
        spark.sparkContext.setJobDescription(f"probe: index warm {name}")
        specs[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    if mode == "seq":
        for name in NAMES:
            build(name)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            list(pool.map(build, NAMES))
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("seq", "overlap"))
    ap.add_argument("--ab", type=int, default=0, help="alternating windows per mode")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", SF_DIR_DEFAULT))
    args = ap.parse_args()

    if args.ab:
        rows: dict[str, list[float]] = {"seq": [], "overlap": []}
        for i in range(args.ab):
            # Alternate the PAIR order per window (seq-first on even windows,
            # overlap-first on odd) so neither arm systematically inherits the
            # other's OS page-cache warming (r13 advice: seq-always-first gave
            # overlap a warm-cache edge in the earliest windows).
            order = ("seq", "overlap") if i % 2 == 0 else ("overlap", "seq")
            for mode in order:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--mode", mode,
                     "--sf-dir", args.sf_dir],
                    capture_output=True, text=True, check=True,
                )
                val = json.loads(out.stdout.strip().splitlines()[-1])["wall_s"]
                rows[mode].append(val)
                print(f"window {i} {mode}: {val}", file=sys.stderr)
        floors = {m: min(v) for m, v in rows.items()}
        print(json.dumps({
            "metric": "index_warm_build_s_ab",
            "sf_dir": args.sf_dir,
            "windows": rows,
            "floors": floors,
            "ratio_overlap_vs_seq": round(floors["overlap"] / floors["seq"], 3),
        }))
        return

    wall = run_once(args.mode or "overlap", args.sf_dir)
    print(json.dumps({"metric": "index_warm_build_s", "mode": args.mode, "wall_s": wall}))


if __name__ == "__main__":
    main()
