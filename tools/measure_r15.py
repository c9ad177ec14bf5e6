"""Round-15 optimization harness: isolated warm-median timing + formatted
plans for named registry queries (guide §1: noop sink, setJobDescription,
explain("formatted")).

Usage:
  python tools/measure_r15.py [--sf SF_DIR] [--reps N] [--plans OUTDIR] \
      [--suffix before|after] name [name ...]

Each query runs `warmup` untimed noop-sink executions then reports the
median of `reps` timed ones — the bench.py discipline, minus the 130-row
session so a single query's number is not polluted by JVM wear. With
--plans the fresh DataFrame's explain("formatted") is written to
OUTDIR/<name>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark_etl_twitter_spark.plans.registry import QUERIES  # noqa: E402
from pyspark_etl_twitter_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_session(app_name="measure_r15")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    out = {}
    for name in args.names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"r15-measure: {name}")
        try:
            for _ in range(args.warmup):
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(max(1, args.reps)):
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            out[name] = round(sorted(ts)[len(ts) // 2], 3)
            print(f"{name}: {out[name]} s  (all: {[round(t,3) for t in ts]})")
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: {exc}")
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        if args.plans:
            pdir = Path(args.plans)
            pdir.mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            (pdir / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
    print("TOTAL:", round(sum(out.values()), 3))


if __name__ == "__main__":
    main()
