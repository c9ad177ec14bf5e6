"""Data-quality report + observe() metric tests."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.quality_checks import (
    data_quality_report,
    observed_pipeline,
)
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


def test_quality_report_counts_violations(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v=5.0),
            Row(k=1, v=50.0),   # dup key + out of range
            Row(k=2, v=None),   # null v
            Row(k=3, v=-1.0),   # out of range
        ]
    )
    r = data_quality_report(
        df, not_null=["v"], unique=["k"], ranges={"v": (0.0, 10.0)}
    ).first()
    assert r.n_rows == 4
    assert r.null_v == 1
    assert r.dup_k == 1
    assert r.oob_v == 2  # nulls don't count as out-of-band


def test_observe_rides_along(spark):
    docs = load_table(spark, SF_TINY, "documents")
    observed, obs = observed_pipeline(docs.select("doc_id", "text"))
    n = observed.count()  # the only action — metrics accumulate during it
    assert obs.get["n_rows"] == n == 500
    assert obs.get["null_doc_id"] == 0


def test_ks_two_sample_exact_values(spark):
    """KS statistic on hand-computed fixtures: disjoint supports give
    D=1; identical samples give D=0; a textbook interleaved case gives
    the exact rational D; ks_at is the smallest attaining value; the
    grouped path computes each group independently."""
    from pyspark_etl_twitter_spark.operators.quality_checks import (
        ks_two_sample,
    )

    # disjoint: A = {1,2,3}, B = {11,12,13} -> D = 1 at v = 3
    rows = [(float(v), False) for v in (1, 2, 3)] + [
        (float(v), True) for v in (11, 12, 13)
    ]
    df = spark.createDataFrame(rows, "x double, b boolean")
    r = ks_two_sample(df, "x", "b").collect()[0]
    assert r.ks_d == 1.0 and r.ks_at == 3.0 and r.n_a == 3 and r.n_b == 3
    # crit_05 = 1.358*sqrt((3+3)/(3*3)) ≈ 1.108797: even D=1 is not
    # significant at n=3 — the asymptotic threshold is honest about
    # sample size
    assert r.crit_05 == 1.108802 and not r.drifted

    # identical samples -> D = 0
    rows2 = [(float(v), False) for v in (1, 2, 2, 5)] + [
        (float(v), True) for v in (1, 2, 2, 5)
    ]
    r2 = ks_two_sample(
        spark.createDataFrame(rows2, "x double, b boolean"), "x", "b"
    ).collect()[0]
    assert r2.ks_d == 0.0 and not r2.drifted

    # interleaved: A = {1,3,5,7}, B = {2,4,6,8}:
    # at each odd v the gap is 1/4 -> D = 0.25, first attained at v=1
    rows3 = [(float(v), False) for v in (1, 3, 5, 7)] + [
        (float(v), True) for v in (2, 4, 6, 8)
    ]
    r3 = ks_two_sample(
        spark.createDataFrame(rows3, "x double, b boolean"), "x", "b"
    ).collect()[0]
    assert r3.ks_d == 0.25 and r3.ks_at == 1.0

    # grouped: one drifting group, one identical group
    rows4 = [("g1", float(v), False) for v in (1, 2, 3)] + [
        ("g1", float(v), True) for v in (11, 12, 13)
    ] + [("g2", float(v), False) for v in (1, 2)] + [
        ("g2", float(v), True) for v in (1, 2)
    ]
    got = {
        r.g: r
        for r in ks_two_sample(
            spark.createDataFrame(rows4, "g string, x double, b boolean"),
            "x",
            "b",
            group_cols=["g"],
        ).collect()
    }
    assert got["g1"].ks_d == 1.0 and got["g2"].ks_d == 0.0

    # quantization collapses distinct values before the window
    rows5 = [(1.24, False), (1.26, False), (1.31, True), (1.29, True)]
    r5 = ks_two_sample(
        spark.createDataFrame(rows5, "x double, b boolean"),
        "x",
        "b",
        round_dp=1,
    ).collect()
    # A quantizes to {1.2, 1.3}, B to {1.3, 1.3}: D = 1/2 at 1.2
    assert r5[0].ks_d == 0.5 and r5[0].ks_at == 1.2


def test_psi_two_sample_hand_computed(spark):
    """PSI on a hand-computed fixture: identical distributions give
    PSI=0 exactly (terms vanish even with smoothing); a fully shifted
    distribution lands in 'major'; the Laplace smoothing keeps
    one-sided-empty bins finite; bin_width controls the bin key."""
    import math

    from pyspark_etl_twitter_spark.operators.quality_checks import (
        psi_two_sample,
    )

    # identical: 10 values each side, same bins -> every (pa - pb) = 0
    rows = [(float(v), False) for v in range(10)] + [
        (float(v), True) for v in range(10)
    ]
    r = psi_two_sample(
        spark.createDataFrame(rows, "x double, b boolean"), "x", "b",
        bin_width=2.0,
    ).collect()[0]
    assert r.psi == 0.0 and r.shift == "stable" and r.n_bins == 5

    # disjoint: A in bin 0, B in bin 5 -> K=2,
    # pa = (10.5/11, 0.5/11), pb = (0.5/11, 10.5/11):
    # psi = 2 * (10/11) * ln(21) = hand value
    rows2 = [(0.0, False)] * 10 + [(10.0, True)] * 10
    r2 = psi_two_sample(
        spark.createDataFrame(rows2, "x double, b boolean"), "x", "b",
        bin_width=2.0,
    ).collect()[0]
    want = round(2 * (10.0 / 11.0) * math.log(10.5 / 0.5), 6)
    assert r2.psi == want and r2.shift == "major"


def test_ks_two_sample_property_vs_python_oracle(spark):
    """Property test vs a direct-spec Python oracle: for random small
    A/B samples, ks_two_sample's (n_a, n_b, ks_d, ks_at) match an
    independent brute-force ECDF computation exactly (quantization
    included)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_etl_twitter_spark.operators.quality_checks import (
        ks_two_sample,
    )

    vals = st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=25
    )

    def oracle(a_vals, b_vals):
        va = sorted(float(v) for v in a_vals)
        vb = sorted(float(v) for v in b_vals)
        na, nb = len(va), len(vb)
        best = None
        for v in sorted(set(va) | set(vb)):
            ca = sum(1 for x in va if x <= v)
            cb = sum(1 for x in vb if x <= v)
            dnum = abs(ca * nb - cb * na)
            if best is None or dnum > best[0]:
                best = (dnum, v)
        return na, nb, round(best[0] / (na * nb), 6), best[1]

    @given(a=vals, b=vals)
    @settings(
        max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(a, b):
        rows = [(float(v), False) for v in a] + [(float(v), True) for v in b]
        df = spark.createDataFrame(rows, "x double, b boolean")
        r = ks_two_sample(df, "x", "b").collect()[0]
        na, nb, d, at = oracle(a, b)
        assert (r.n_a, r.n_b, r.ks_d, r.ks_at) == (na, nb, d, at)

    run()


def test_benford_profile_conformant_vs_uniform(spark):
    """The Benford ruler must PASS a Benford-distributed sample (built by
    inverse-CDF: value 10^u for u uniform in [0,1)) and FAIL a uniform
    sample (leading digits equidistributed → max_dev vs log-law ≈ 0.08);
    digits are zero-filled, proportions sum to 1, and the expected
    vector is the log10(1 + 1/d) law."""
    import math

    from pyspark_etl_twitter_spark.operators.quality_checks import (
        BENFORD_P,
        benford_profile,
    )

    n = 4000
    benford_rows = [(i, 10.0 ** ((i * 0.6180339887498949) % 1.0)) for i in range(n)]
    uniform_rows = [(i, 1.0 + 8.998 * ((i * 0.6180339887498949) % 1.0)) for i in range(n)]
    bdf = spark.createDataFrame(benford_rows, "id long, v double")
    udf_ = spark.createDataFrame(uniform_rows, "id long, v double")

    b = {r.digit: r for r in benford_profile(bdf, "v").collect()}
    u = {r.digit: r for r in benford_profile(udf_, "v").collect()}
    assert set(b) == set(range(1, 10)) and set(u) == set(range(1, 10))
    assert abs(sum(r.obs_p for r in b.values()) - 1.0) < 1e-6
    for d in range(1, 10):
        assert abs(b[d].exp_p - round(BENFORD_P[d - 1], 6)) < 1e-9
    assert all(r.benford_ok for r in b.values())
    assert not any(r.benford_ok for r in u.values())
    assert u[1].max_dev > 0.05  # uniform digits: ~0.111 each vs 0.301 at d=1

    # grouped: each group gets its own zero-filled frame and verdict
    both = bdf.withColumn("g", F.lit("ben")).unionByName(
        udf_.withColumn("g", F.lit("uni"))
    )
    g = {
        (r.g, r.digit): r.benford_ok
        for r in benford_profile(both, "v", group_cols=["g"]).collect()
    }
    assert len(g) == 18
    assert g[("ben", 1)] and not g[("uni", 1)]
