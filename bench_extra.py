"""Extra benchmarks for the r07 optimization round (guide §1.4 noop-sink
isolation). ``bench.py`` is FROZEN for driver measurement; everything ad-hoc
lives here.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --queries jaccard_pairs,simhash_pairs
  python bench_extra.py --sf /root/testdata/sf1.0 --explain plans/r07 --suffix before
  python bench_extra.py --sf /root/testdata/sf1.0            # all headline rows

Prints one JSON line per query: {"query": ..., "best": ..., "runs": [...],
"steal_pct": [...]} using the same steal-gated best-of-3 protocol as bench.py
(imported, not copied).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (frozen harness: reuse _timed_best / wait_quiet / _make_spark)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--queries", default=None, help="comma list; default: all headline")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--explain", default=None, help="dir to write explain('formatted') to")
    ap.add_argument("--suffix", default="before", help="plan file suffix (before/after)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-quiet-wait", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args.queries.split(",") if args.queries else list(bench.HEADLINE)
    spark = bench._make_spark(args.cpus, "bench-extra")

    if args.explain:
        out = Path(args.explain)
        out.mkdir(parents=True, exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (out / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
            print(f"wrote {out}/{name}_{args.suffix}.txt")
        spark.stop()
        return

    if not args.no_quiet_wait:
        bench.wait_quiet(verbose=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")

        def _one(q=qs[name]):
            q(spark, args.sf).write.format("noop").mode("overwrite").save()

        _one()  # warm-up
        r = bench._timed_best(_one, n_runs=args.runs)
        print(json.dumps({"query": name, **{k: r[k] for k in ("best", "best_steal_pct", "runs", "steal_pct", "steal_gated")}}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
