"""Measure the durable-checkpoint overhead of the connected-components
loop at bench scale (r9 verdict ask #6).

``duplicate_clusters`` defaults to ``localCheckpoint()`` (zero-copy to
executor block storage — fine on local mode, fatal on executor loss in a
real cluster) and grew a ``checkpoint_dir`` mode in r9 that switches to
reliable ``checkpoint()``. The 100 TB recommendation is "durable on real
clusters"; this tool puts a measured cost on that recommendation so it
is a priced tradeoff, not hand-waving. Results recorded in DESIGN.md
("Durable CC checkpoint cost").

Methodology mirrors bench.py: the candidate-pair stage is materialized
ONCE off the clock (it is identical across modes), then each mode runs
one warmup + N timed end-to-end CC solves (median reported). The durable
mode writes to a fresh local tmp dir per rep — on this container that is
the same disk the shuffle spills to, so the delta is the serialize+write
+read round-trip cost, the component a cluster deployment would pay
against HDFS/S3 latencies.

Run: python tools/bench_durable_cc.py [sf_dir] [reps]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_etl_twitter_spark.operators.dedup import duplicate_clusters  # noqa: E402
from pyspark_etl_twitter_spark.operators.similarity import (  # noqa: E402
    embedding_near_dup_pairs,
)
from pyspark_etl_twitter_spark.plans.advanced_queries import (  # noqa: E402
    SEMANTIC_PLANES,
    SEMANTIC_SEED,
    SEMANTIC_TAU,
)
from pyspark_etl_twitter_spark.session import get_session  # noqa: E402
from pyspark_etl_twitter_spark.sources.catalog import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_session(app_name="bench_durable_cc")
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(
        emb, threshold=SEMANTIC_TAU, n_planes=SEMANTIC_PLANES, seed=SEMANTIC_SEED
    ).localCheckpoint()
    n_pairs = pairs.count()
    print(f"pairs materialized: {n_pairs} (sf_dir={sf_dir})")

    def solve(ckpt_dir: str | None) -> int:
        return duplicate_clusters(
            pairs, a_col="vec_a", b_col="vec_b", checkpoint_dir=ckpt_dir
        ).count()

    results: dict[str, float] = {}
    n_clustered: dict[str, int] = {}
    for mode in ("local", "durable"):
        tmp = tempfile.mkdtemp(prefix=f"cc_{mode}_") if mode == "durable" else None
        try:
            n_clustered[mode] = solve(tmp)  # warmup
            times = []
            for i in range(reps):
                rep_dir = (
                    tempfile.mkdtemp(prefix=f"cc_{mode}_r{i}_")
                    if mode == "durable"
                    else None
                )
                try:
                    t0 = time.perf_counter()
                    solve(rep_dir)
                    times.append(time.perf_counter() - t0)
                finally:
                    if rep_dir:
                        shutil.rmtree(rep_dir, ignore_errors=True)
            results[mode] = sorted(times)[len(times) // 2]
            print(
                f"{mode:8s} median {results[mode]:.3f}s "
                f"(reps: {[round(t, 3) for t in times]}, "
                f"rows={n_clustered[mode]})"
            )
        finally:
            if tmp:
                shutil.rmtree(tmp, ignore_errors=True)

    assert n_clustered["local"] == n_clustered["durable"], "modes disagree!"
    ovh = results["durable"] / results["local"]
    print(
        f"durable/local = {ovh:.2f}x "
        f"(+{results['durable'] - results['local']:.3f}s absolute)"
    )


if __name__ == "__main__":
    main()
