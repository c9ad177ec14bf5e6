"""Plan-fingerprint stability (r8 verdict #1).

The bench's regression tripwire hashes `explain("formatted")` text after
normalizing run-variant tokens. Through r8 it missed `plan_id=N` — a
PER-SESSION global counter printed by Exchange/BroadcastExchange nodes —
so the same commit hashed differently depending on how many plans the
session had built before each query (72/84 fingerprints "changed" between
two runs of identical code, and the tripwire meant nothing).

These tests pin the failure mode directly: build each pinned query's
fingerprint, advance the session's plan_id counter by constructing
unrelated plans, and assert the fingerprint is byte-identical. Fails on
any future run-variant token the normalizer doesn't absorb.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _FP_NOISE, plan_fingerprint  # noqa: E402

from pyspark_etl_twitter_spark.plans.registry import QUERIES  # noqa: E402

from tests.conftest import SF_SMALL  # noqa: E402

# Pinned across the engine's plan shapes: scan-agg (q6), broadcast join
# chain (revenue_by_nation), window/sessionize, range-join bucketing, and
# an explode-heavy text pipeline — each exercises a different mix of
# Exchange/Subquery/Generate nodes whose printed ids could drift.
PINNED = [
    "tpch_q6_forecast_revenue",
    "revenue_by_nation",
    "sessionize_events",
    "binned_range_join_bands",
    "doc_fingerprints",
    # r9 What's-wrong #1: the old two-countDistinct form printed as either
    # of two RewriteDistinctAggregates gid orders depending on the
    # session's expr-id counter — r10 rewrote it to a single-distinct
    # shape (operators/dedup.normalized_dedup_summary); this pin holds it
    "dedup_normalized_summary",
    # r10 additions, each a new plan-shape mix: segment dedup (Generate +
    # struct-min SortAggregate + ObjectHashAggregate collect_list),
    # SemDeDup (InMemoryRelation cache ids + residual-condition SMJ with
    # nested HOF lambdas — the densest lambda-counter surface in the book)
    "dedup_segments_rebuild",
    "semdedup_cluster_summary",
]


def _shift_plan_id_counter(spark, n: int = 5) -> None:
    """Advance the session-global plan_id counter the way a bench run
    does: build (and format-explain) unrelated physical plans."""
    import contextlib
    import io

    for _ in range(n):
        with contextlib.redirect_stdout(io.StringIO()):
            QUERIES["pricing_summary"](spark, SF_SMALL).explain("formatted")


@pytest.mark.parametrize("name", PINNED)
def test_fingerprint_survives_plan_id_counter_shift(spark, name):
    fp1, text1 = plan_fingerprint(QUERIES[name](spark, SF_SMALL))
    _shift_plan_id_counter(spark)
    fp2, text2 = plan_fingerprint(QUERIES[name](spark, SF_SMALL))
    assert fp1 == fp2, (
        f"{name}: fingerprint unstable across identical plans — a "
        f"run-variant token survives _FP_NOISE; diff:\n"
        + "\n".join(
            f"-{a}\n+{b}"
            for a, b in zip(text1.splitlines(), text2.splitlines())
            if a != b
        )[:2000]
    )


def test_normalizer_strips_plan_id_token():
    text = "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1537]"
    for pat, repl in _FP_NOISE:
        text = pat.sub(repl, text)
    assert "1537" not in text and "plan_id=x" in text
