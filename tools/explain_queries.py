"""Dump .explain("formatted") for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/explain_queries.py --tag r13 --suffix before [--sf-dir DIR] q1 q2 ...

Iterative queries (driver-coordinated loops) eagerly run their loop at
build time; the captured plan is the FINAL frame's plan (rounds appear as
checkpointed leaves). For those, the per-round frame extractors
(_pair_argmax_frame, _pagerank_round, ...) are what the plan-guard tests
assert; this tool records the end-to-end shape the driver's noop sink sees.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jetstream_spark.queries import all_queries  # noqa: E402
from jetstream_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("jetstream_spark_explain")
    specs = all_queries()
    for name in args.queries:
        df = specs[name].build(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {args.sf_dir} ({args.suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
