"""Curation operators: decontamination, PII, epoch shuffle, n-gram
profile, length histogram (engine-added surface, SURVEY.md §2.12)."""

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators import curation as C
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY
from tests.test_plans import plan_of


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# -- decontamination -------------------------------------------------------


def test_contamination_planted_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon", "s"),  # shares the 4-gram
            (2, "one two three four five", "s"),  # no overlap
            (3, "al be ga de", "s"),  # 4 tokens, 1 gram, no overlap
        ],
    )
    eval_docs = _docs(spark, [(100, "x alpha beta gamma delta y", "e")])
    out = C.contamination_overlap(train, eval_docs, n=4)
    got = {r["doc_id"]: (r["n_shared"], r["contaminated"]) for r in out.collect()}
    assert got[1] == (1, True)  # "alpha beta gamma delta"
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_contamination_short_docs_survive(spark):
    train = _docs(spark, [(1, "a b", "s"), (2, "", "s")])
    eval_docs = _docs(spark, [(9, "a b c d e", "e")])
    out = C.contamination_overlap(train, eval_docs, n=4)
    got = {r["doc_id"]: r["n_shared"] for r in out.collect()}
    assert got == {1: 0, 2: 0}  # sub-n docs kept, zero overlap


def test_contamination_hashed_probe_matches_exact(spark):
    docs = load_table(spark, SF_TINY, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    exact = sorted(
        (r["doc_id"], r["n_shared"])
        for r in C.contamination_overlap(train, eval_docs, n=4).collect()
    )
    hashed = sorted(
        (r["doc_id"], r["n_shared"])
        for r in C.contamination_overlap(
            train, eval_docs, n=4, hash_grams=True
        ).collect()
    )
    assert exact == hashed


def test_contamination_eval_side_broadcast(spark):
    docs = load_table(spark, SF_TINY, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    plan = plan_of(C.contamination_overlap(docs, eval_docs, n=4))
    assert "BroadcastHashJoin" in plan  # gram probe never shuffles the corpus


# -- Bloom-filter decontamination (round 10) --------------------------------


def test_bloom_contamination_never_misses(spark):
    """Bloom can only over-flag: every exact-contaminated doc is
    bloom-flagged, and with the default 2^20-bit map the tiny corpus has
    no room for false positives either."""
    docs = load_table(spark, SF_TINY, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    exact = {
        r["doc_id"]
        for r in C.contamination_overlap(train, eval_docs, n=4)
        .filter("contaminated")
        .collect()
    }
    flagged = {
        r["doc_id"]
        for r in C.bloom_contamination(train, eval_docs, n=4)
        .filter("bloom_flagged")
        .collect()
    }
    assert exact <= flagged
    assert exact == flagged  # 2^20 bits vs ~1e3 grams: fp_rate ~ 1e-11


def test_bloom_contamination_tiny_bitmap_overflags_only(spark):
    """Squeezing the bitmap (m_bits=64) forces false positives — the
    superset property must still hold (no misses, ever)."""
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon", "s"),
            (2, "one two three four five", "s"),
            (3, "red green blue cyan magenta", "s"),
        ],
    )
    eval_docs = _docs(spark, [(100, "x alpha beta gamma delta y", "e")])
    out = {
        r["doc_id"]: r["bloom_flagged"]
        for r in C.bloom_contamination(
            train, eval_docs, n=4, k_hashes=2, m_bits=64
        ).collect()
    }
    assert out[1] is True  # the planted true hit always flags
    assert set(out) == {1, 2, 3}  # left join keeps clean docs


def test_bloom_bitmap_is_broadcast_constant_size(spark):
    """The bitmap ships as a broadcast one-row relation, not a plan
    literal — plan text stays O(1) in eval-set size, and the corpus-side
    probe never shuffles before the positive filter."""
    docs = load_table(spark, SF_TINY, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    out = C.bloom_contamination(docs, eval_docs, n=4, m_bits=1 << 14)
    plan = plan_of(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("bloom_bits") < 30  # bitmap is a column, not inlined


# -- PII -------------------------------------------------------------------


def test_redact_pii_email_before_digits(spark):
    df = spark.range(1).select(
        C.redact_pii(F.lit("mail bob99@example.com or call 555 1234")).alias("r")
    )
    assert df.first()["r"] == "mail <EMAIL> or call <NUM> <NUM>"


def test_pseudonymize_deterministic_and_distinct(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long").select(
        "k", C.pseudonymize("k", namespace="t").alias("p")
    )
    rows = {r["k"]: r["p"] for r in df.collect()}
    assert rows[1] != rows[2] and len(rows[1]) == 64
    again = {
        r["k"]: r["p"]
        for r in spark.createDataFrame([(1,)], "k long")
        .select("k", C.pseudonymize("k", namespace="t").alias("p"))
        .collect()
    }
    assert again[1] == rows[1]


def test_generalize_band(spark):
    df = spark.createDataFrame([(1234.5,), (-1.0,)], "v double").select(
        C.generalize_band("v", width=1000.0).alias("b")
    )
    assert [r["b"] for r in df.collect()] == [1000.0, -1000.0]


# -- epoch shuffle ---------------------------------------------------------


def test_epoch_shuffle_is_contiguous_permutation(spark):
    docs = load_table(spark, SF_TINY, "documents")
    n = docs.count()
    out = C.epoch_shuffle(docs, seed=42)
    poss = sorted(r["pos"] for r in out.select("pos").collect())
    assert poss == list(range(n))


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark):
    docs = load_table(spark, SF_TINY, "documents").limit(200)
    a = {r["doc_id"]: r["pos"] for r in C.epoch_shuffle(docs, seed=7).collect()}
    b = {r["doc_id"]: r["pos"] for r in C.epoch_shuffle(docs, seed=7).collect()}
    c = {r["doc_id"]: r["pos"] for r in C.epoch_shuffle(docs, seed=8).collect()}
    assert a == b
    assert a != c


def test_global_row_index_matches_global_sort(spark):
    docs = load_table(spark, SF_TINY, "documents").withColumn(
        "_k", C.shuffle_key("doc_id", 3)
    )
    idx = C.global_row_index(docs, "_k", n_buckets=16)
    by_index = [
        r["doc_id"] for r in idx.orderBy("pos").select("doc_id").collect()
    ]
    by_sort = [r["doc_id"] for r in docs.orderBy("_k").select("doc_id").collect()]
    assert by_index == by_sort


def test_epoch_shuffle_window_is_partitioned(spark):
    docs = load_table(spark, SF_TINY, "documents")
    plan = plan_of(C.epoch_shuffle(docs, seed=42))
    # the rank window must run per bucket, not on one global partition
    assert "_bkt" in plan


# -- n-gram profile + histogram --------------------------------------------


def test_ngram_profile_counts(spark):
    docs = _docs(spark, [(1, "a b a b", "s"), (2, "a b c", "s")])
    out = C.ngram_profile(docs, n=2, k=10)
    got = {r["gram"]: r["n_occurrences"] for r in out.collect()}
    assert got == {"a b": 3, "b a": 1, "b c": 1}


def test_ngram_profile_topk_avoids_global_sort(spark):
    docs = load_table(spark, SF_TINY, "documents")
    assert "TakeOrderedAndProject" in plan_of(C.ngram_profile(docs, n=2, k=50))


def test_length_histogram_partitions_corpus(spark):
    docs = load_table(spark, SF_TINY, "documents")
    out = C.length_histogram(docs, bin_width=64).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert all(r["bin_lo"] % 64 == 0 for r in out)


def test_weighted_bernoulli_sample_rate_and_stability(spark):
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.curation import (
        weighted_bernoulli_sample,
    )
    from pyspark_etl_twitter_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    sample = weighted_bernoulli_sample(docs, weight_col="n_chars", denom=1000)
    got = sample.count()
    expected = docs.select(
        F.sum(F.least(F.col("n_chars") / 1000.0, F.lit(1.0)))
    ).first()[0]
    # binomial-ish tolerance: 5 sigma of sum of independent Bernoullis
    sigma = (expected * 1.0) ** 0.5
    assert abs(got - expected) < 5 * sigma + 5
    # inclusion is row-local: the same ids stay selected in any subset
    subset_ids = {
        r.doc_id
        for r in weighted_bernoulli_sample(
            docs.filter("doc_id % 2 = 0"), weight_col="n_chars", denom=1000
        ).collect()
    }
    full_even_ids = {
        r.doc_id for r in sample.filter("doc_id % 2 = 0").collect()
    }
    assert subset_ids == full_even_ids
    # longer docs are sampled proportionally more often
    rate_long = sample.filter("n_chars >= 400").count() / max(
        docs.filter("n_chars >= 400").count(), 1
    )
    rate_short = sample.filter("n_chars < 200").count() / max(
        docs.filter("n_chars < 200").count(), 1
    )
    assert rate_long > rate_short


# -- round 4: fuzzy decontamination, budget selection, temperature mix ----


def test_jaccard_contamination_planted(spark):
    train = _docs(
        spark,
        [
            # 4/6 distinct unigram-shingles shared with eval 100 at n=1;
            # with n=3 grams shift — plant an exact 5-token overlap
            (1, "alpha beta gamma delta epsilon zeta", "s"),
            (2, "one two three four five six", "s"),
        ],
    )
    eval_docs = _docs(spark, [(100, "alpha beta gamma delta epsilon omega", "e")])
    got = {
        r["doc_id"]: (r["max_jaccard"], r["best_eval_id"])
        for r in C.jaccard_contamination(train, eval_docs, shingle_n=3).collect()
    }
    # doc 1: 3-shingles {abg, bgd, gde, dez} vs eval {abg, bgd, gde, deo}
    # → inter 3, union 5 → 0.6; doc 2: no shared shingle → absent
    assert got[1] == (0.6, 100)
    assert 2 not in got


def test_jaccard_contamination_broadcasts_eval_side(spark):
    docs = load_table(spark, SF_TINY, "documents")
    eval_docs = docs.filter("doc_id % 97 = 0")
    plan = plan_of(C.jaccard_contamination(docs, eval_docs))
    assert "BroadcastHashJoin" in plan


def test_containment_catches_the_embedded_eval_item_jaccard_dilutes(spark):
    """The asymmetric leak: a long train doc embeds an ENTIRE short eval
    doc verbatim. Containment (inter/|eval|) = 1.0; Jaccard is diluted
    to inter/|train| and slips under any useful threshold."""
    eval_text = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(40))
    train = _docs(spark, [(1, filler + " " + eval_text, "s")])
    eval_docs = _docs(spark, [(100, eval_text, "e")])
    cont = {
        r["doc_id"]: (r["max_containment"], r["best_eval_id"])
        for r in C.containment_contamination(
            train, eval_docs, shingle_n=3
        ).collect()
    }
    # all 3 eval shingles appear in the train doc -> containment 1.0
    assert cont[1] == (1.0, 100)
    jac = {
        r["doc_id"]: r["max_jaccard"]
        for r in C.jaccard_contamination(train, eval_docs, shingle_n=3).collect()
    }
    # train has 43 distinct 3-shingles, eval 3, inter 3 -> 3/43 ~ 0.07
    assert jac[1] < 0.1


def test_containment_contamination_broadcasts_eval_side(spark):
    docs = load_table(spark, SF_TINY, "documents")
    eval_docs = docs.filter("doc_id % 97 = 0")
    plan = plan_of(C.containment_contamination(docs, eval_docs))
    assert "BroadcastHashJoin" in plan


def test_streaming_containment_score_equals_batch(spark, tmp_path):
    """Streamed ingest-time decontamination against a frozen eval set:
    streamed per-doc containment equals the batch operator (with the
    emit-all 0.0 coalesce), and replaying the source dir under the
    checkpoint is a no-op."""
    import json

    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.streaming.incremental import (
        streaming_containment_score,
    )

    docs = load_table(spark, SF_TINY, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    incoming = docs.filter(
        (F.col("doc_id") % 97 != 0) & (F.col("doc_id") < 40)
    ).select("doc_id", "text")
    n_incoming = incoming.count()
    src = tmp_path / "incoming"
    src.mkdir()
    lines = [
        json.dumps({"doc_id": r.doc_id, "text": r.text, "lang": "en",
                    "source": "sX", "n_chars": len(r.text)})
        for r in incoming.collect()
    ]
    (src / "batch0.json").write_text("\n".join(lines[:20]))
    (src / "batch1.json").write_text("\n".join(lines[20:]))

    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    streaming_containment_score(spark, str(src), eval_docs, out, ckpt)
    streamed = {
        r.doc_id: round(r.max_containment, 6)
        for r in spark.read.parquet(out).collect()
    }
    scored = C.containment_contamination(incoming, eval_docs)
    batch = {
        r.doc_id: round(
            r.max_containment if r.max_containment is not None else 0.0, 6
        )
        for r in incoming.join(scored, "doc_id", "left")
        .select("doc_id", "max_containment")
        .collect()
    }
    assert streamed == batch and len(streamed) == n_incoming

    # replay is a no-op under the checkpoint
    streaming_containment_score(spark, str(src), eval_docs, out, ckpt)
    assert spark.read.parquet(out).count() == n_incoming


def test_select_within_budget_exact_boundary(spark):
    docs = spark.createDataFrame(
        [(1, "a", 30), (2, "a", 20), (3, "a", 10), (4, "b", 100)],
        "doc_id long, source string, n_chars long",
    )
    kept = C.select_within_budget(docs, budget=50, size_col="n_chars")
    got = sorted(r.doc_id for r in kept.collect())
    # source a: 30 (prev 0) kept, 20 (prev 30) kept, 10 (prev 50) dropped;
    # source b: first doc always kept even when it alone exceeds budget
    assert got == [1, 2, 4]


def test_temperature_mix_flattens_sources(spark):
    docs = load_table(spark, SF_TINY, "documents")
    kept = C.temperature_mix_sample(docs, scale=10)
    n_by_src = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    k_by_src = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # expected keep rate ~ 10/sqrt(n): larger sources keep a SMALLER share
    big = max(n_by_src, key=n_by_src.get)
    small = min(n_by_src, key=n_by_src.get)
    if n_by_src[big] > 2 * n_by_src[small]:
        assert (
            k_by_src.get(big, 0) / n_by_src[big]
            <= k_by_src.get(small, 0) / n_by_src[small] + 0.2
        )
    # determinism: same seed → same set
    again = {r.doc_id for r in C.temperature_mix_sample(docs, scale=10).collect()}
    assert again == {r.doc_id for r in kept.collect()}


def test_source_vocab_overlap_planted(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma", "s1"),
            (2, "alpha beta delta", "s2"),   # 2/4 shared with s1
            (3, "zz yy xx", "s3"),           # disjoint
        ],
    )
    got = {
        (r.ga, r.gb): (r.n_inter, r.vocab_jaccard)
        for r in C.source_vocab_overlap(docs).collect()
    }
    assert got[("s1", "s2")] == (2, 0.5)
    assert ("s1", "s3") not in got  # zero-intersection pairs are absent


def test_jaccard_contamination_hashed_matches_string_probe(spark):
    docs = load_table(spark, SF_TINY, "documents")
    ev = docs.filter("doc_id % 97 = 0")
    tr = docs.filter("doc_id % 97 != 0")
    s = {(r.doc_id, r.max_jaccard, r.best_eval_id)
         for r in C.jaccard_contamination(tr, ev, shingle_n=3).collect()}
    h = {(r.doc_id, r.max_jaccard, r.best_eval_id)
         for r in C.jaccard_contamination(tr, ev, shingle_n=3, hash_grams=True).collect()}
    assert s == h


def test_fan_out_gate_skips_corpus_shuffle_on_wide_input(spark):
    """ngram_profile / jaccard_contamination must NOT shuffle the raw
    corpus when the scan already has cluster-level parallelism — the
    doc-id repartition exists only to fan a single local file across
    cores. Pin by counting doc_id hash exchanges in the physical plan:
    the wide-input plan has exactly one fewer than the narrow-input plan."""

    def n_docid_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning(doc_id")

    docs = load_table(spark, SF_TINY, "documents")
    par = spark.sparkContext.defaultParallelism
    wide = docs.repartition(par)
    ev = docs.filter("doc_id % 97 = 0")

    # ngram_profile: the only aggregate keys on gram, so the wide plan has
    # ZERO doc_id exchanges (explode runs on the scan partitions); narrow
    # gets exactly the one fan-out repartition
    assert n_docid_exchanges(C.ngram_profile(wide, n=2, k=10)) == 0
    assert n_docid_exchanges(C.ngram_profile(docs, n=2, k=10)) == 1

    # jaccard_contamination: the wide plan's two doc_id-keyed exchanges
    # ((id,_eid) agg + (id) agg) carry only MATCHED probe rows — tiny by
    # contract — while the narrow plan's single exchange is the fan-out of
    # the raw corpus (acceptable only because narrow == one local file;
    # unconditional, it was the round-4 slowest bench query)
    assert n_docid_exchanges(C.jaccard_contamination(wide, ev, shingle_n=3)) == 2
    assert n_docid_exchanges(C.jaccard_contamination(docs, ev, shingle_n=3)) == 1

    # and the gated queries still return identical results either way
    a = sorted(map(tuple, C.ngram_profile(wide, n=2, k=10).collect()))
    b = sorted(map(tuple, C.ngram_profile(docs, n=2, k=10).collect()))
    assert a == b


def test_quantile_map_hand_computed(spark):
    """Quantile map on a planted fixture: group A = 1..10, group B =
    11..20 (pooled = 1..20). Step inverse ECDF: A's q50 = 5, B's q50 =
    15, pooled q50 = 10 -> shifts -5 / +5; q10 of A = 1 (cum 1 >= 1);
    ties and exact integer thresholds have no float wobble."""
    from pyspark_etl_twitter_spark.operators.curation import quantile_map

    rows = [("A", float(v)) for v in range(1, 11)] + [
        ("B", float(v)) for v in range(11, 21)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        (r.g, r.q_pct): r
        for r in quantile_map(df, "x", "g", n_q=10, round_dp=0).collect()
    }
    assert got[("A", 50)].group_value == 5.0
    assert got[("B", 50)].group_value == 15.0
    assert got[("A", 50)].pooled_value == 10.0
    assert got[("A", 50)].shift == -5.0 and got[("B", 50)].shift == 5.0
    assert got[("A", 10)].group_value == 1.0
    assert got[("B", 90)].group_value == 19.0
    assert len(got) == 18  # 2 groups x 9 interior deciles


def test_quantile_map_property_vs_python_oracle(spark):
    """Property test vs a direct-spec Python oracle: for random grouped
    integer samples, every (group, q_pct) cell of quantile_map matches
    the brute-force step inverse ECDF (smallest v with n_q*cum >=
    i*total over the distinct-value domain ... counts, not distincts)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_etl_twitter_spark.operators.curation import quantile_map

    group_vals = st.lists(
        st.integers(min_value=0, max_value=20), min_size=1, max_size=20
    )

    def inv(vals, n_q=4):
        from collections import Counter

        c = Counter(float(v) for v in vals)
        tot = sum(c.values())
        out = {}
        for i in range(1, n_q):
            cum = 0
            for v in sorted(c):
                cum += c[v]
                if cum * n_q >= i * tot:
                    out[int(100 * i / n_q)] = v
                    break
        return out

    @given(a=group_vals, b=group_vals)
    @settings(
        max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(a, b):
        rows = [("A", float(v)) for v in a] + [("B", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, x double")
        got = {
            (r.g, r.q_pct): (r.group_value, r.pooled_value)
            for r in quantile_map(df, "x", "g", n_q=4, round_dp=0).collect()
        }
        pooled = inv(a + b)
        for g, vals in (("A", a), ("B", b)):
            want = inv(vals)
            for q, v in want.items():
                assert got[(g, q)] == (v, pooled[q])

    run()


def test_leakage_safe_split_keeps_clusters_together(spark):
    """The leakage guard itself: every member of a near-dup cluster gets
    the SAME split (chains included — A~B, B~C with no A~C edge), the
    canonical member's key decides it (hash_split equivalence on the
    cluster id), and unpaired docs split exactly as id-keyed hash_split
    would — so the operator only changes assignments where leakage was
    possible."""
    from pyspark_etl_twitter_spark.operators.curation import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 21)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.split, r._cluster_key)
        for r in leakage_safe_split(docs, pairs).collect()
    }
    assert out[1][0] == out[5][0] == out[9][0]  # chain -> one split
    assert out[20][0] == out[21][0]
    assert out[1][1] == 1 and out[9][1] == 1 and out[21][1] == 20

    plain = {
        r.doc_id: r.split
        for r in hash_split(
            docs, "doc_id", seed="leak-v1",
            weights=(("train", 80), ("val", 10), ("test", 10)),
        ).collect()
    }
    clustered = {1, 5, 9, 20, 21}
    for i in range(40):
        if i not in clustered:
            assert out[i][0] == plain[i]  # singletons unchanged
    # cluster members inherit the CANONICAL id's assignment
    assert out[5][0] == plain[1] and out[21][0] == plain[20]
