"""Dedup operator tests: planted duplicates + exact-Jaccard cross-checks.
MinHash/SimHash are xxhash64-based (not DuckDB-oracle-able); their gate is
recall/precision against the exact operators here."""

import pytest
from pyspark.sql import Row

from pyspark_etl_twitter_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_dedup_groups,
    exact_dedup_summary,
    near_dup_pairs_minhash,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "machine learning models need large clean training data sets to work well",
    "spark executes distributed dataframe plans with catalyst and tungsten engines",
    "completely unrelated text about cooking pasta with tomato sauce and basil",
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    i = 0
    for text in BASE:
        rows.append(Row(doc_id=i, text=text)); i += 1
    # exact duplicate of doc 0
    rows.append(Row(doc_id=i, text=BASE[0])); i += 1
    # near duplicate of doc 1 (one word changed)
    rows.append(Row(doc_id=i, text=BASE[1].replace("clean", "fresh"))); i += 1
    # near duplicate of doc 2 (word appended)
    rows.append(Row(doc_id=i, text=BASE[2] + " quickly")); i += 1
    # padding distinct docs
    for j in range(20):
        rows.append(Row(doc_id=i, text=f"filler document number {j} with unique token f{j} and more f{j} text here")); i += 1
    return spark.createDataFrame(rows)


def test_exact_dedup(spark, corpus):
    s = exact_dedup_summary(corpus).first()
    assert s.n_docs == 27 and s.n_dup_docs == 1
    groups = exact_dedup_groups(corpus).collect()
    assert len(groups) == 1 and groups[0].canonical_id == 0 and groups[0].n_copies == 2
    kept = drop_exact_duplicates(corpus)
    assert kept.count() == 26
    assert kept.filter("doc_id = 4").count() == 0  # dup of doc 0 dropped
    assert kept.filter("doc_id = 0").count() == 1  # min-id survivor kept


def test_minhash_finds_planted_near_dups(spark, corpus):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs_minhash(corpus, shingle_n=3, threshold=0.3).collect()
    }
    assert (0, 4) in pairs and pairs[(0, 4)] == 1.0  # exact dup
    assert (1, 5) in pairs  # one-word swap
    assert (2, 6) in pairs  # appended word
    # no cross-base false positives
    for a, b in pairs:
        assert (a % 4 == b % 4) or max(a, b) <= 6


def test_minhash_jaccard_matches_exact(spark, corpus):
    """The verify stage must report the exact shingle-Jaccard."""
    mh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs_minhash(corpus, shingle_n=3, threshold=0.3).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, shingle_n=3, threshold=0.3).collect()
    }
    for pair, j in mh.items():
        assert exact[pair] == j  # LSH pairs ⊆ exact pairs, same similarity


def test_simhash(spark, corpus):
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(corpus).collect()}
    assert fps[0] == fps[4]  # identical docs → identical fingerprint
    ham_15 = bin(fps[1] ^ fps[5]).count("1")
    ham_unrelated = bin(fps[0] ^ fps[3]).count("1")
    assert ham_15 < ham_unrelated  # near-dup closer than unrelated
    pairs = simhash_near_dup_pairs(
        simhash_fingerprints(corpus), max_hamming=6
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 4) in found
    hams = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert hams[(0, 4)] == 0


def test_simhash_band_width_derives_from_bits(spark):
    """r7 advice: band width must come from the ACTUAL fingerprint width
    (``bits``), not the 63-bit default — 63//6 == 60//6 was a coincidence
    that band counts like 7 break (63//7=9 vs 60//7=8). With
    ``bits=60, bands=7`` the candidate set must equal a Python
    recomputation at width 8; the old SIMHASH_BITS-derived width 9 yields
    a different bucket keying and a different candidate set."""
    import random

    from pyspark_etl_twitter_spark.operators.dedup import simhash_near_dup_pairs

    rng = random.Random(11)
    fps = [(i, rng.getrandbits(60)) for i in range(120)]
    # plant near-identical pairs so candidates exist at every width
    fps += [(200 + i, fps[i][1] ^ (1 << rng.randrange(60))) for i in range(10)]
    df = spark.createDataFrame(fps, "doc_id long, simhash long")
    # max_hamming=60 disables the verify filter: the result IS the banded
    # candidate set, which is exactly what the width controls
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dup_pairs(
            df, max_hamming=60, bands=7, bits=60
        ).collect()
    }
    width = 60 // 7  # 8
    want = set()
    by_band: dict = {}
    for i, fp in fps:
        for j in range(7):
            by_band.setdefault((j, (fp >> (j * width)) & ((1 << width) - 1)), []).append(i)
    for ids in by_band.values():
        for a in ids:
            for b in ids:
                if a < b:
                    want.add((a, b))
    assert got == want
    # pigeonhole floor: the planted hamming-1 pairs are always candidates
    assert all((i, 200 + i) in got for i in range(10))


def test_duplicate_clusters_transitive_closure(spark):
    """A~B and B~C (no A~C edge) must form ONE cluster labeled min(A,B,C);
    disjoint pairs stay separate; chain of 4 converges past one round."""
    from pyspark_etl_twitter_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 21), (30, 31), (31, 32), (32, 33)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 5: 1, 9: 1, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30, 33: 30}


def test_cluster_source_profile_pair_algebra(spark):
    """Hand-built clusters: cluster 1 = {1:A, 2:A, 3:B}, cluster 10 =
    {10:B, 11:B}. Expected matrix: (A,A) 1 cluster / 1 within-source
    pair (the two A members of cluster 1), (A,B) 1 cluster / 2 cross
    pairs (2 A-members x 1 B-member), (B,B) 1 cluster / 1 pair (cluster
    10; cluster 1's single-B membership does NOT count as within-B
    duplication)."""
    from pyspark_etl_twitter_spark.operators.dedup import cluster_source_profile

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (10, "B"), (11, "B"), (99, "C")],
        "doc_id long, source string",
    )
    got = {
        (r.source_a, r.source_b): (r.n_clusters, r.n_doc_pairs)
        for r in cluster_source_profile(clusters, docs).collect()
    }
    assert got == {
        ("A", "A"): (1, 1),
        ("A", "B"): (1, 2),
        ("B", "B"): (1, 1),
    }


def test_duplicate_clusters_durable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir switches lineage truncation from executor-pinned
    localCheckpoint to reliable checkpoint() files (the 100 TB mode:
    survives executor loss mid-loop). Same answer in both modes, and the
    durable run must actually write RDD checkpoint files to the dir."""
    from pyspark_etl_twitter_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 21), (30, 31), (31, 32), (32, 33)],
        "doc_a long, doc_b long",
    )
    ckpt = str(tmp_path / "cc_ckpt")
    got = {
        r.doc_id: r.cluster_id
        for r in duplicate_clusters(pairs, checkpoint_dir=ckpt).collect()
    }
    assert got == {1: 1, 5: 1, 9: 1, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30, 33: 30}
    written = list((tmp_path / "cc_ckpt").rglob("*"))
    assert written, "reliable checkpoint() wrote nothing to checkpoint_dir"


def test_drop_near_duplicates_keeps_canonical_and_singletons(spark):
    from pyspark_etl_twitter_spark.operators.dedup import drop_near_duplicates

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 3), (3, 6)], "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in drop_near_duplicates(docs, pairs).collect())
    # cluster {1,3,6} -> keep 1; everything unpaired survives
    assert kept == [0, 1, 2, 4, 5, 7]


def test_duplicate_clusters_on_minhash_pairs(spark, corpus):
    """End-to-end scale composition: LSH pairs -> components. The planted
    exact dup (0,4) and near dups (1,5), (2,6) must each form a 2-cluster."""
    from pyspark_etl_twitter_spark.operators.dedup import duplicate_clusters

    pairs = near_dup_pairs_minhash(corpus, shingle_n=1, threshold=0.5)
    got = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert got[0] == 0 and got[4] == 0
    assert got[1] == 1 and got[5] == 1
    assert got[2] == 2 and got[6] == 2


def test_incremental_dedup(spark):
    from pyspark_etl_twitter_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "seen before"),   # already in corpus -> dropped
            (11, "brand new"),     # survives
            (12, "brand new"),     # within-batch dup of 11 -> dropped
            (13, "another fresh"), # survives
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in incremental_dedup(new, corpus).collect())
    assert kept == [11, 13]


def test_duplicate_clusters_long_chain(spark):
    """A 20-node path graph (worst-case diameter for its size) must still
    collapse to one cluster within the iteration bound."""
    from pyspark_etl_twitter_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 120)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert set(got.values()) == {100} and len(got) == 21


def test_lsh_star_guard_preserves_components(spark):
    """A 100-doc near-identical swarm: with the star guard the pair list is
    O(n) yet downstream clustering yields the same single component as the
    unguarded quadratic pairing."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        duplicate_clusters,
        near_dup_pairs_minhash,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{base} tail{i}") for i in range(100)]
    rows += [(200 + i, f"totally different text number {i} about topic{i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    guarded = near_dup_pairs_minhash(
        docs, shingle_n=1, threshold=0.5, star_bucket_threshold=16
    )
    unguarded = near_dup_pairs_minhash(
        docs, shingle_n=1, threshold=0.5, star_bucket_threshold=None
    )
    n_guard = guarded.count()
    n_full = unguarded.count()
    assert n_guard < n_full  # star collapsed the quadratic swarm
    assert n_full > 4000     # the swarm really is a near-clique
    assert n_guard <= 400    # star edges + small-bucket residue only

    clus_g = {r.doc_id: r.cluster_id for r in duplicate_clusters(guarded).collect()}
    clus_f = {r.doc_id: r.cluster_id for r in duplicate_clusters(unguarded).collect()}
    # the whole swarm is one component with canonical doc 0 in both modes,
    # and the guard changes no component assignment anywhere
    assert all(clus_g[i] == 0 for i in range(100))
    assert clus_g == clus_f


def test_duplicate_clusters_random_graph_matches_union_find(spark):
    """Cross-partition stress for the contraction CC: a random graph mixing
    long chains, cliques, and singleton-ish stars, spread across many
    partitions, must match a driver-side union-find exactly."""
    import random

    from pyspark_etl_twitter_spark.operators.dedup import duplicate_clusters

    rng = random.Random(42)
    edges = []
    # long chains (the diameter stress that defeats per-hop propagation)
    base = 0
    for chain_len in (50, 80):
        edges += [(base + i, base + i + 1) for i in range(chain_len)]
        base += chain_len + 1
    # cliques
    for size in (5, 8):
        nodes = list(range(base, base + size))
        edges += [(a, b) for a in nodes for b in nodes if a < b]
        base += size
    # random sparse edges among a fresh block
    block = list(range(base, base + 200))
    edges += [tuple(sorted(rng.sample(block, 2))) for _ in range(120)]

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"]).repartition(16)
    got = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert got == expect


def test_portable_minhash_matches_exact_and_finds_planted(spark, corpus):
    """The md5-hash twin (near_dup_pairs_minhash_portable) must behave like
    the xxhash64 path: find the planted near-dups, and report the exact
    shingle-Jaccard for every emitted pair (precision 1.0 by construction)."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        near_dup_pairs_minhash_portable,
    )

    mh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs_minhash_portable(
            corpus, shingle_n=3, threshold=0.3, num_hashes=32, bands=8
        ).collect()
    }
    assert (0, 4) in mh and mh[(0, 4)] == 1.0  # exact dup always collides
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, shingle_n=3, threshold=0.3).collect()
    }
    for pair, j in mh.items():
        assert exact[pair] == j  # emitted pairs ⊆ exact pairs, same value


def test_portable_minhash_recall_parity_with_xxhash64(spark):
    """Equality-of-recall evidence (r6 verdict ask #3): on the real sf0.001
    documents table, the md5-derived hash family must recall the
    exact-Jaccard ground-truth pairs as well as the xxhash64 family — the
    families differ, the banding math doesn't. Star guard OFF here: the
    sf0.001 corpus is swarm-heavy (90k truth pairs over 500 docs), so with
    the guard on BOTH paths deliberately trade pair-level recall inside
    oversized buckets for O(n) edges; that tradeoff is covered by
    test_lsh_star_guard_preserves_components, not this recall check.

    Measured guard-off at 16 hashes / 4 bands: recall_xx 0.690 /
    recall_portable ~0.69 at j>=0.5, both >=0.97 at j>=0.9 (expected
    1-(1-j^4)^4 = 0.986)."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        near_dup_pairs_minhash_portable,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, shingle_n=1, threshold=0.5).collect()
    }
    assert truth  # the synthetic corpus plants near-dups; truth is non-empty
    xx = {
        (r.doc_a, r.doc_b)
        for r in near_dup_pairs_minhash(
            docs, shingle_n=1, threshold=0.5, num_hashes=16, bands=4,
            star_bucket_threshold=None,
        ).collect()
    }
    portable = {
        (r.doc_a, r.doc_b)
        for r in near_dup_pairs_minhash_portable(
            docs, shingle_n=1, threshold=0.5, num_hashes=16, bands=4,
            star_bucket_threshold=None,
        ).collect()
    }
    keys = set(truth)
    assert xx <= keys and portable <= keys  # exact verify → precision 1.0
    recall_xx = len(xx) / len(truth)
    recall_portable = len(portable) / len(truth)
    # same band/row geometry → same collision-probability curve
    assert abs(recall_portable - recall_xx) <= 0.05
    # near-exact dups must essentially always collide in some band
    high = {k for k, j in truth.items() if j >= 0.9}
    assert len(portable & high) / len(high) >= 0.95
    assert len(xx & high) / len(high) >= 0.95


def test_portable_simhash_behaves_like_xxhash64(spark, corpus):
    """The md5-hash SimHash twin keeps the fingerprint semantics: identical
    docs → identical fingerprints, near-dups closer in hamming than
    unrelated docs, and all fingerprints fit the 60-bit budget."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        PORTABLE_SIMHASH_BITS,
        simhash_fingerprints_portable,
    )

    fps = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints_portable(corpus).collect()
    }
    assert fps[0] == fps[4]  # identical docs
    assert all(0 <= v < (1 << PORTABLE_SIMHASH_BITS) for v in fps.values())
    ham_15 = bin(fps[1] ^ fps[5]).count("1")
    ham_unrelated = bin(fps[0] ^ fps[3]).count("1")
    assert ham_15 < ham_unrelated


def test_portable_term_hash_cross_engine_fuzz(spark):
    """The load-bearing assumption of every md5 'portable' twin: Spark's
    conv(substr(md5(i||':'||term),1,15),16,10) equals DuckDB's
    ('0x'||substr(md5(...),1,15))::BIGINT for arbitrary unicode terms
    (both engines hash the UTF-8 bytes). Fuzzes ASCII, accents, CJK,
    emoji, digits-only, and long terms across several hash indices."""
    import duckdb

    from pyspark_etl_twitter_spark.operators.dedup import portable_term_hash

    terms = [
        "hello", "", " ", "café", "naïve", "日本語テキスト", "🎉✨", "0",
        "123456789", "a" * 500, "tab\tand\nnewline", "quote\"'back\\slash",
        "ärger-Øresund-ß", "مرحبا", "привет мир", "mixed 混合 text 🚀",
    ]
    import random

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 éüñ中文🎯"
    terms += ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60)))
              for _ in range(40)]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in terms], ["term"])
    for i in (0, 1, 7, 15):
        got = {
            r.term: r.h
            for r in df.select(
                "term", portable_term_hash(F.col("term"), i).alias("h")
            ).collect()
        }
        con = duckdb.connect()
        want = {
            t: con.execute(
                "SELECT ('0x' || substr(md5(? || ':' || ?), 1, 15))::BIGINT",
                [str(i), t],
            ).fetchone()[0]
            for t in terms
        }
        assert got == want, {t: (got[t], want[t]) for t in terms if got[t] != want[t]}


def test_portable_minhash_star_guard_branch_vs_duckdb(spark):
    """The driver's sf0.01 subset never trips the star guard (50 docs ≤
    threshold 64), so the oracle's star branch would be dead code without
    this test: a 100-doc near-identical swarm with threshold 16 must
    produce IDENTICAL verified pairs from the Spark operator and a DuckDB
    oracle generated with the same threshold — including the bmin-star
    edges that replace the quadratic bucket join."""
    import duckdb

    from pyspark_etl_twitter_spark.operators.dedup import (
        near_dup_pairs_minhash_portable,
    )
    from pyspark_etl_twitter_spark.plans.text_queries import (
        _PMH_BANDS,
        _PMH_HASHES,
        _portable_minhash_ctes,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{base} tail{i}") for i in range(100)]
    rows += [(200 + i, f"totally different text number {i} about topic{i}")
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in near_dup_pairs_minhash_portable(
            docs, num_hashes=_PMH_HASHES, bands=_PMH_BANDS, shingle_n=1,
            threshold=0.5, star_bucket_threshold=16,
        ).collect()
    )
    ctes = _portable_minhash_ctes().replace(
        "sub AS (SELECT * FROM documents WHERE doc_id % 10 = 0)",
        "sub AS (SELECT * FROM documents)",
    ).replace("bsz <= 64", "bsz <= 16").replace("bsz > 64", "bsz > 16")
    con = duckdb.connect()
    con.register("documents_pd", docs.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {ctes} SELECT doc_a, doc_b, jaccard FROM vpairs"
        ).fetchall()
    )
    assert got, "star-guard swarm must emit pairs"
    assert got == want
    # and the guard really fired: the quadratic pair count would be ≥ 4000
    assert len(got) < 1000


def test_kmeans_fit_portable_quality_and_determinism(spark):
    """kmeans_fit_portable must (a) be deterministic, (b) produce a
    clustering whose inertia is within a small factor of the tol-based
    kmeans_fit at equal iteration budget — the 6dp centroid rounding is a
    verifiability tweak, not a quality change."""
    from pyspark_etl_twitter_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
        kmeans_fit_portable,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = kmeans_fit_portable(emb, 8, iters=3)
    c2 = kmeans_fit_portable(emb, 8, iters=3)
    assert c1 == c2  # deterministic, rounding makes equality exact
    trained, history = kmeans_fit(emb, 8, max_iters=3)

    def inertia(cents):
        return kmeans_assign(emb, cents).agg(F.sum("dist2")).first()[0]

    i_portable, i_plain = inertia(c1), inertia(trained)
    assert i_portable <= i_plain * 1.01  # rounding costs ≤1% inertia


def test_portable_minhash_random_corpora_cross_engine(spark):
    """Corpus-level cross-engine fuzz: random documents (unicode terms,
    empty docs, planted near-dup pairs) through the FULL portable pipeline
    — tokenize → signatures → bands → star guard → verify — must produce
    identical (doc_a, doc_b, jaccard) sets from Spark and DuckDB. Catches
    tokenization / banding / grouping divergences the primitive-level
    hash fuzz can't see."""
    import random

    import duckdb
    import pandas as pd

    from pyspark_etl_twitter_spark.operators.dedup import (
        near_dup_pairs_minhash_portable,
    )
    from pyspark_etl_twitter_spark.plans.text_queries import _portable_minhash_ctes

    vocab = ("alpha beta gamma delta räksmörgås 中文 🎉 epsilon zeta eta "
             "theta iota kappa lambda mu nu xi omicron pi rho sigma").split()
    for seed in (3, 11):
        rng = random.Random(seed)
        rows = []
        for i in range(60):
            n = rng.randint(0, 12)
            rows.append((i * 10, " ".join(rng.choice(vocab) for _ in range(n))))
        # planted near-dups: copy with one word swapped
        for j, (did, text) in enumerate(rows[:10]):
            toks = text.split()
            if toks:
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            rows.append((did + 1, " ".join(toks)))  # id%10 != 0 → excluded…
        # keep ids on the %10 grid so the oracle's subset matches
        rows = [(k * 10, t) for k, (_, t) in enumerate(rows)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in near_dup_pairs_minhash_portable(
                docs, num_hashes=16, bands=4, shingle_n=1, threshold=0.5
            ).collect()
        )
        con = duckdb.connect()
        con.register("documents_pd", pd.DataFrame(rows, columns=["doc_id", "text"]))
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"WITH {_portable_minhash_ctes()} "
                "SELECT doc_a, doc_b, jaccard FROM vpairs"
            ).fetchall()
        )
        assert got == want, (seed, len(got), len(want))
        assert got  # planted dups guarantee a non-empty pair set


# --------------------------------------------------------------------------
# Segment-level dedup (round 10)
# --------------------------------------------------------------------------


def test_segment_dedup_keep_first_and_rebuild(spark):
    from pyspark_etl_twitter_spark.operators.dedup import segment_dedup

    rows = [
        # doc 0: segments (w=3): "a b c" / "d e f" / "g"
        Row(doc_id=0, text="a b c d e f g"),
        # doc 1 repeats doc 0's first segment at position 0, then fresh
        Row(doc_id=1, text="a b c x y z"),
        # doc 2 is doc 0 verbatim → every segment already seen
        Row(doc_id=2, text="a b c d e f g"),
        # doc 3 repeats a segment WITHIN itself
        Row(doc_id=3, text="p q r p q r"),
        # doc 4: empty text is one empty segment, globally unique
        Row(doc_id=4, text=""),
    ]
    out = {
        r.doc_id: r
        for r in segment_dedup(
            spark.createDataFrame(rows), seg_tokens=3
        ).collect()
    }
    assert out[0].n_segments == 3 and out[0].n_kept == 3
    assert out[0].new_text == "a b c d e f g"
    # doc 1 loses its first segment to doc 0
    assert out[1].n_segments == 2 and out[1].n_kept == 1
    assert out[1].new_text == "x y z"
    # doc 2 loses everything but still appears in the output
    assert out[2].n_kept == 0 and out[2].new_text == ""
    # within-doc repeat: the later copy is dropped too
    assert out[3].n_segments == 2 and out[3].n_kept == 1
    assert out[3].new_text == "p q r"
    assert out[4].n_segments == 1 and out[4].n_kept == 1


def test_segment_dedup_order_is_positional_not_lexicographic(spark):
    """Survivor choice is (doc_id, position)-first; rebuild preserves the
    original segment order, not a sort by content."""
    from pyspark_etl_twitter_spark.operators.dedup import segment_dedup

    rows = [
        Row(doc_id=10, text="z z w w"),  # segments "z z" / "w w"
        Row(doc_id=11, text="w w z z"),  # same segments, swapped order
    ]
    out = {
        r.doc_id: r
        for r in segment_dedup(
            spark.createDataFrame(rows), seg_tokens=2
        ).collect()
    }
    # doc 10 is first by id: keeps both, in ITS order
    assert out[10].new_text == "z z w w"
    assert out[11].n_kept == 0


# --------------------------------------------------------------------------
# SemDeDup (round 10)
# --------------------------------------------------------------------------


def test_semdedup_drops_within_cluster_near_dups_only(spark):
    from pyspark_etl_twitter_spark.operators.clustering import (
        kmeans_fit_portable,
    )
    from pyspark_etl_twitter_spark.operators.dedup import semdedup_drop_ids

    # two tight blobs on orthogonal axes + one duplicate inside each
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.99, 0.01, 0.0]),   # near-dup of 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=3, embedding=[0.0, 0.98, 0.02]),   # near-dup of 2
        Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),     # singleton direction
    ]
    emb = spark.createDataFrame(rows)
    cents = kmeans_fit_portable(emb, 3, iters=3)
    dropped = {
        r.vec_id
        for r in semdedup_drop_ids(emb, cents, threshold=0.9).collect()
    }
    # the higher id of each within-cluster near-dup pair goes; the
    # orthogonal singleton survives
    assert dropped == {1, 3}


def test_semdedup_misses_cross_cluster_pairs_by_design(spark):
    """The paper's documented recall tradeoff: a near-dup pair split
    across cluster boundaries is NOT dropped."""
    from pyspark_etl_twitter_spark.operators.clustering import kmeans_assign
    from pyspark_etl_twitter_spark.operators.dedup import semdedup_drop_ids

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.05]),
        Row(vec_id=1, embedding=[1.0, -0.05]),  # cosine ~0.995 with 0
    ]
    emb = spark.createDataFrame(rows)
    # hand-placed centroids that split the pair
    cents = [[1.0, 0.05], [1.0, -0.05]]
    assigned = {r.vec_id: r.cluster for r in kmeans_assign(emb, cents).collect()}
    assert assigned[0] != assigned[1]
    assert semdedup_drop_ids(emb, cents, threshold=0.9).count() == 0


def test_semdedup_from_ivf_matches_within_list_brute_force(spark, tmp_path):
    """The index-backed form must drop exactly the higher-id member of
    every within-LIST cosine>=tau pair of the persisted assignments —
    cross-checked against a driver-side brute force over the same lists."""
    import itertools
    import math

    from pyspark_etl_twitter_spark.operators.dedup import semdedup_from_ivf
    from pyspark_etl_twitter_spark.operators.similarity import build_ivf_index

    import random

    rng = random.Random(7)
    rows = []
    # three tight direction-blobs (cosine-coherent, so IVF's cosine-argmax
    # cells group them) + jitter
    for i in range(60):
        base = [0.0] * 6
        base[i % 3] = 1.0
        rows.append(
            Row(
                vec_id=i,
                embedding=[x + rng.uniform(-0.05, 0.05) for x in base],
            )
        )
    emb = spark.createDataFrame(rows)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_lists=4, max_queries=1)

    got = {r.vec_id for r in semdedup_from_ivf(spark, path, threshold=0.9).collect()}

    assigned = spark.read.parquet(f"{path}/assignments").collect()
    by_list = {}
    for r in assigned:
        by_list.setdefault(r.list_id, []).append((r.vec_id, list(r.emb)))
    expect = set()
    for members in by_list.values():
        for (ia, va), (ib, vb) in itertools.combinations(sorted(members), 2):
            d = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            if round(d / (na * nb), 6) >= 0.9:
                expect.add(max(ia, ib))
    assert got == expect and got  # non-trivial: the blobs must collide


def test_semdedup_pandas_matches_hof(spark):
    """The BLAS pair kernel must produce the same drop set as the
    oracle-parity fold on the real embeddings corpus (sf0.001) and on
    planted blobs — the equality pin that lets the full-corpus bench/
    driver row ride the fast path."""
    from pyspark_etl_twitter_spark.operators.clustering import (
        kmeans_fit_portable,
    )
    from pyspark_etl_twitter_spark.operators.dedup import semdedup_drop_ids
    from pyspark_etl_twitter_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_fit_portable(emb, 4, iters=2)
    hof = {
        r.vec_id
        for r in semdedup_drop_ids(emb, cents, threshold=0.30).collect()
    }
    fast = {
        r.vec_id
        for r in semdedup_drop_ids(
            emb, cents, threshold=0.30, engine="pandas"
        ).collect()
    }
    assert hof == fast and hof  # non-trivial on the real corpus


def test_semdedup_from_ivf_plan_is_pruned_equi_join(spark, tmp_path):
    """Plan contract for the registry row (the sweep SKIPs it because the
    index build executes writes): the pair scan must be a list_id
    EQUI-join over the persisted assignments — no cartesian product, no
    BNLJ, no Python UDF anywhere."""
    from pyspark_etl_twitter_spark.operators.dedup import semdedup_from_ivf
    from pyspark_etl_twitter_spark.operators.similarity import build_ivf_index

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_lists=4, max_queries=1)
    plan = (
        semdedup_from_ivf(spark, path, threshold=0.30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_segment_dedup_whitespace_roundtrip_property(spark):
    """r10 verdict ask #7: segment_dedup splits on SINGLE spaces and
    reassembles with concat_ws(' ') — the tokenizer-boundary semantics
    must round-trip texts containing runs of spaces, leading/trailing
    spaces, and non-ASCII unicode spaces (NBSP, ideographic space stay
    INSIDE tokens: only U+0020 is a boundary — the CCNet line shape).
    Property, vs a Python oracle of the same algorithm: for any corpus,
    (n_segments, n_kept, new_text) match the oracle exactly — in
    particular a corpus with NO cross-or-within-doc duplicate segments
    reassembles to the exact original text, empty tokens included."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_etl_twitter_spark.operators.dedup import segment_dedup

    token = st.sampled_from(
        ["a", "bb", "ccc", "", "x y", "　", "tab\tkept", "zz"]
    )
    text = st.lists(token, min_size=0, max_size=13).map(" ".join)
    corpus = st.lists(text, min_size=1, max_size=8)

    def oracle(texts, w):
        seen = set()
        out = []
        for i, t in enumerate(texts):
            toks = t.split(" ")
            segs = [
                " ".join(toks[j : j + w]) for j in range(0, len(toks), w)
            ]
            kept = []
            for s in segs:
                if s not in seen:
                    seen.add(s)
                    kept.append(s)
            out.append((i, len(segs), len(kept), " ".join(kept)))
        return out

    @given(texts=corpus, w=st.integers(min_value=1, max_value=4))
    @settings(
        max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(texts, w):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = sorted(
            (r.doc_id, r.n_segments, r.n_kept, r.new_text)
            for r in segment_dedup(df, seg_tokens=w).collect()
        )
        assert got == oracle(texts, w)

    run()


def test_semdedup_precollapse_equals_plain(spark):
    """Exact-dup pre-collapse must produce EXACTLY the drop set of plain
    SemDeDup — on a corpus with planted identical-vector swarms (the
    star-cluster shape the collapse exists to neutralize) and on the
    real sf0.001 embeddings (no exact dups: collapse is a no-op)."""
    import random

    from pyspark_etl_twitter_spark.operators.clustering import (
        kmeans_fit_portable,
    )
    from pyspark_etl_twitter_spark.operators.dedup import (
        semdedup_drop_ids,
        semdedup_drop_ids_precollapsed,
    )

    rng = random.Random(53)
    rows = []
    # 40 distinct vectors + a 30-copy swarm of one boilerplate vector
    for i in range(40):
        rows.append(Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)]))
    boiler = [0.5] * 8
    for j in range(30):
        rows.append(Row(vec_id=100 + j, embedding=list(boiler)))
    emb = spark.createDataFrame(rows)
    cents = kmeans_fit_portable(emb, 4, iters=2)
    for thresh in (0.30, 0.95):
        plain = {
            r.vec_id
            for r in semdedup_drop_ids(emb, cents, threshold=thresh).collect()
        }
        fast = {
            r.vec_id
            for r in semdedup_drop_ids_precollapsed(
                emb, cents, threshold=thresh
            ).collect()
        }
        assert plain == fast
        # the swarm always collapses to its lowest id at any threshold
        assert {101 + j for j in range(29)} <= fast

    real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rcents = kmeans_fit_portable(real, 4, iters=2)
    plain = {r.vec_id for r in semdedup_drop_ids(real, rcents, threshold=0.3).collect()}
    fast = {
        r.vec_id
        for r in semdedup_drop_ids_precollapsed(real, rcents, threshold=0.3).collect()
    }
    assert plain == fast and plain


def test_remove_duplicated_spans_semantics(spark):
    """Exact-substring removal (Lee et al. 2022, n-gram form) on a
    hand-planted fixture: a shared block is cut from every occurrence
    and only the block (boundary grams into unique text don't leak);
    overlapping duplicated grams merge to one maximal span; within-doc
    repetition alone does NOT trigger removal (min_docs counts DISTINCT
    documents); sub-n docs are untouched; an all-boilerplate doc
    rebuilds to the empty string."""
    from pyspark_etl_twitter_spark.operators.dedup import remove_duplicated_spans

    block = "b1 b2 b3 b4"  # shared 4-token block, n=4
    docs = spark.createDataFrame(
        [
            (0, f"u01 u02 {block} u03 u04"),
            (1, f"v01 {block} v02 v03 v04"),
            # within-doc repeated gram, unique to this doc -> kept
            (2, "w01 r1 r2 r3 r4 w02 r1 r2 r3 r4 w03"),
            # shorter than n -> no grams, untouched
            (3, "x01 x02 x03"),
            # doc that is nothing but the shared block
            (4, block),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in remove_duplicated_spans(docs, n=4, min_docs=2).collect()
    }
    assert out[0].text == "u01 u02 u03 u04" and out[0].tokens_removed == 4
    assert out[1].text == "v01 v02 v03 v04" and out[1].tokens_removed == 4
    assert out[2].text == "w01 r1 r2 r3 r4 w02 r1 r2 r3 r4 w03"
    assert out[2].tokens_removed == 0
    assert out[3].text == "x01 x02 x03" and out[3].tokens_removed == 0
    assert out[4].text == "" and out[4].tokens_removed == 4

    # overlapping duplicated grams merge into one maximal span: two docs
    # share a 6-token run; with n=4 the three covering grams overlap and
    # the whole 6-token run is removed from both
    run = "s1 s2 s3 s4 s5 s6"
    docs2 = spark.createDataFrame(
        [(0, f"a1 {run} a2"), (1, f"b1 b2 {run}")],
        "doc_id long, text string",
    )
    out2 = {
        r.doc_id: r
        for r in remove_duplicated_spans(docs2, n=4, min_docs=2).collect()
    }
    assert out2[0].text == "a1 a2" and out2[0].tokens_removed == 6
    assert out2[1].text == "b1 b2" and out2[1].tokens_removed == 6


def test_remove_duplicated_spans_keep_first(spark):
    """keep_first=True (the paper-faithful retention mode): the
    canonical (min doc, min start) occurrence of each duplicated block
    survives; every other copy is cut — including extra copies INSIDE
    the canonical document."""
    from pyspark_etl_twitter_spark.operators.dedup import remove_duplicated_spans

    block = "b1 b2 b3 b4"
    docs = spark.createDataFrame(
        [
            (0, f"u01 {block} u02"),
            (1, f"v01 {block} v02"),
            (2, f"{block} w01"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in remove_duplicated_spans(
            docs, n=4, min_docs=2, keep_first=True
        ).collect()
    }
    assert out[0].text == f"u01 {block} u02" and out[0].tokens_removed == 0
    assert out[1].text == "v01 v02" and out[1].tokens_removed == 4
    assert out[2].text == "w01" and out[2].tokens_removed == 4

    # a second copy inside the canonical doc is still cut
    docs2 = spark.createDataFrame(
        [(0, f"{block} x01 {block}"), (1, f"y01 {block}")],
        "doc_id long, text string",
    )
    out2 = {
        r.doc_id: r
        for r in remove_duplicated_spans(
            docs2, n=4, min_docs=2, keep_first=True
        ).collect()
    }
    assert out2[0].text == f"{block} x01" and out2[0].tokens_removed == 4
    assert out2[1].text == "y01" and out2[1].tokens_removed == 4


def test_remove_duplicated_spans_aggjoin_equals_postings(spark):
    """scale_mode='aggjoin' (no posting array ever materializes — the
    100 TB shape for corpus-hot fingerprints, r12 advice) returns
    byte-identical rows to the default postings mode, in both retention
    modes, including the hot-fingerprint case (one block shared by
    every doc) and in-canonical-doc repeats."""
    import pytest

    from pyspark_etl_twitter_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    block = "b1 b2 b3 b4"
    docs = spark.createDataFrame(
        [
            (0, f"{block} x01 {block}"),
            (1, f"y01 {block} y02"),
            (2, f"{block}"),
            (3, f"z01 z02 {block} z03"),
            (4, "q01 q02 q03 q04 q05"),
        ],
        "doc_id long, text string",
    )
    for kf in (False, True):
        a = {
            r.doc_id: (r.text, r.tokens_removed, r.n_tokens)
            for r in remove_duplicated_spans(
                docs, n=4, min_docs=2, keep_first=kf
            ).collect()
        }
        b = {
            r.doc_id: (r.text, r.tokens_removed, r.n_tokens)
            for r in remove_duplicated_spans(
                docs, n=4, min_docs=2, keep_first=kf, scale_mode="aggjoin"
            ).collect()
        }
        assert a == b
    with pytest.raises(ValueError, match="scale_mode"):
        remove_duplicated_spans(docs, scale_mode="nope")


def test_remove_duplicated_spans_property_vs_python_oracle(spark):
    """Property test vs an independent brute-force Python oracle: for
    any random small corpus and n, both remove-all and keep-first modes
    match the oracle's rebuilt text and removal counts exactly. The
    oracle implements the SPEC directly (n-gram postings, distinct-doc
    count, canonical argmin, coverage, rebuild) with none of the
    DataFrame machinery."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_etl_twitter_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    token = st.sampled_from(["a", "b", "c", "d"])
    text = st.lists(token, min_size=0, max_size=12).map(" ".join)
    corpus = st.lists(text, min_size=1, max_size=5)

    def oracle(texts, n, keep_first):
        toks = [([t for t in x.split(" ") if t]) for x in texts]
        posts = {}
        for d, ts in enumerate(toks):
            for s in range(len(ts) - n + 1):
                posts.setdefault(tuple(ts[s : s + n]), []).append((d, s))
        out = []
        for d, ts in enumerate(toks):
            removed = set()
            for gram, occ in posts.items():
                if len({dd for dd, _ in occ}) < 2:
                    continue
                canon = min(occ)
                for dd, s in occ:
                    if dd != d:
                        continue
                    if keep_first and (dd, s) == canon:
                        continue
                    removed.update(range(s, s + n))
            kept = [t for p, t in enumerate(ts) if p not in removed]
            out.append((d, len(ts), len(ts) - len(kept), " ".join(kept)))
        return sorted(out)

    @given(
        texts=corpus,
        n=st.integers(min_value=2, max_value=4),
        keep_first=st.booleans(),
    )
    @settings(
        max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(texts, n, keep_first):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = sorted(
            (r.doc_id, r.n_tokens, r.tokens_removed, r.text)
            for r in remove_duplicated_spans(
                df, n=n, min_docs=2, keep_first=keep_first
            ).collect()
        )
        assert got == oracle(texts, n, keep_first)

    run()


# --------------------------------------------------------------------------
# Persisted MinHash index → incremental near-dup dedup (round 13)
# --------------------------------------------------------------------------

def _mh_index_kw():
    # bands=8/rows=2 keeps banded collision probability near 1 for the
    # planted J≈0.8 pairs (1-(1-j²)⁸), so the fixture is deterministic
    return dict(num_hashes=16, bands=8, shingle_n=1, threshold=0.5,
                star_bucket_threshold=64)


def _mh_fixture(spark):
    corpus = spark.createDataFrame(
        [
            (0, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
            (10, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
            (20, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # near-dup of corpus doc 0 (9/11 = 0.818 unigram Jaccard)
            (100, "a1 a2 a3 a4 a5 a6 a7 a8 a9 z1"),
            # unique -> survives
            (110, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"),
            # 120/130 near-dup each other only -> 120 survives (pair-min)
            (120, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"),
            (130, "e1 e2 e3 e4 e5 e6 e7 e8 e9 z2"),
            # exact text copy of corpus doc 10 -> J=1.0, dropped
            (140, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
        ],
        "doc_id long, text string",
    )
    return corpus, batch


def test_minhash_index_incremental_semantics(spark, tmp_path):
    """Persisted-signature incremental near-dup dedup: a batch doc near-
    dupping an indexed doc is dropped (whatever the id order), within-batch
    near-dups keep the min id, unique docs survive, and the store ends up
    holding corpus + survivors' band rows + texts."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
    )

    corpus, batch = _mh_fixture(spark)
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path, **_mh_index_kw())
    surv = sorted(
        r.doc_id for r in minhash_index_append(spark, path, batch).collect()
    )
    assert surv == [110, 120]
    stored_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{path}/texts").select("doc_id").collect()
    }
    assert stored_ids == {0, 10, 20, 110, 120}


def test_minhash_index_append_equals_rebuild(spark, tmp_path):
    """The store after an append is EXACTLY what a from-scratch build over
    (corpus ∪ survivors) produces — signatures are deterministic per doc,
    so the incremental path never diverges from the rebuild."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
    )

    corpus, batch = _mh_fixture(spark)
    p_inc = str(tmp_path / "inc")
    kw = _mh_index_kw()
    build_minhash_index(corpus, p_inc, **kw)
    surv = minhash_index_append(spark, p_inc, batch)
    p_full = str(tmp_path / "full")
    build_minhash_index(corpus.unionByName(surv), p_full, **kw)
    rows = lambda p: {  # noqa: E731
        (r.doc_id, r.band_id, r.band_key)
        for r in spark.read.parquet(f"{p}/bands").collect()
    }
    assert rows(p_inc) == rows(p_full)


def test_minhash_index_reappend_is_noop(spark, tmp_path):
    """Idempotence (the streaming-replay contract): re-appending an
    already-processed batch adds nothing — replayed ids are dropped by the
    id guard, and a same-text/new-id copy verifies at J=1.0."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
    )

    corpus, batch = _mh_fixture(spark)
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path, **_mh_index_kw())
    minhash_index_append(spark, path, batch)
    n_bands = spark.read.parquet(f"{path}/bands").count()

    again = minhash_index_append(spark, path, batch)
    assert again.count() == 0
    assert spark.read.parquet(f"{path}/bands").count() == n_bands

    # same text under a NEW id: caught by verification, not the id guard
    clone = spark.createDataFrame(
        [(999, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")], "doc_id long, text string"
    )
    assert minhash_index_append(spark, path, clone).count() == 0
    assert spark.read.parquet(f"{path}/bands").count() == n_bands


def test_streaming_minhash_dedup_ingest(spark, tmp_path):
    """Streaming half of the incremental near-dup lifecycle: documents
    arriving as files are deduped against the persisted store (near-dup
    of an indexed doc dropped, unique doc appended), later probes see the
    survivor, and re-running the drained directory is a no-op (offsets
    committed — the exactly-once intake contract)."""
    import json

    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
    )
    from pyspark_etl_twitter_spark.streaming.incremental import (
        streaming_minhash_dedup_ingest,
    )

    corpus, _ = _mh_fixture(spark)
    idx = str(tmp_path / "idx")
    build_minhash_index(corpus, idx, **_mh_index_kw())

    src = tmp_path / "incoming"
    src.mkdir()
    rows = [
        # near-dup of indexed doc 0 -> dropped
        {"doc_id": 300, "text": "a1 a2 a3 a4 a5 a6 a7 a8 a9 z9"},
        # unique -> survives
        {"doc_id": 310, "text": "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"},
    ]
    (src / "batch.json").write_text(
        "\n".join(
            json.dumps({**r, "lang": "en", "source": "s", "n_chars": len(r["text"])})
            for r in rows
        )
    )
    ckpt = str(tmp_path / "ckpt")
    streaming_minhash_dedup_ingest(spark, str(src), idx, ckpt)
    ids = {
        r.doc_id
        for r in spark.read.parquet(f"{idx}/texts").select("doc_id").collect()
    }
    assert 310 in ids and 300 not in ids
    n = spark.read.parquet(f"{idx}/bands").count()

    # a LATER batch near-dupping the streamed survivor 310 is dropped —
    # the store dedups against earlier batches, not just the build corpus
    surv = minhash_index_append(
        spark,
        idx,
        spark.createDataFrame(
            [(320, "f1 f2 f3 f4 f5 f6 f7 f8 f9 z8")], "doc_id long, text string"
        ),
    )
    assert surv.count() == 0

    # drained directory -> replay is a no-op
    streaming_minhash_dedup_ingest(spark, str(src), idx, ckpt)
    assert spark.read.parquet(f"{idx}/bands").count() == n


def test_compact_minhash_index_preserves_probes(spark, tmp_path):
    """Compaction after appends must shrink the file count and leave the
    store's CONTENT — and therefore every future probe decision —
    byte-identical (the compact_lsh_index contract applied to the
    near-dup store)."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        compact_minhash_index,
        minhash_index_append,
    )

    corpus, batch = _mh_fixture(spark)
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path, **_mh_index_kw())
    # several appends -> several small files
    for i, row in enumerate(batch.collect()):
        minhash_index_append(
            spark,
            path,
            spark.createDataFrame([(row.doc_id, row.text)], "doc_id long, text string"),
        )
    rows = lambda sub, cols: sorted(  # noqa: E731
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(f"{path}/{sub}").collect()
    )
    b_before = rows("bands", ["doc_id", "band_id", "band_key"])
    t_before = rows("texts", ["doc_id", "text"])
    before, after = compact_minhash_index(spark, path)
    assert after < before
    assert rows("bands", ["doc_id", "band_id", "band_key"]) == b_before
    assert rows("texts", ["doc_id", "text"]) == t_before
    # probes still dedup against the compacted store
    clone = spark.createDataFrame(
        [(999, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")], "doc_id long, text string"
    )
    assert minhash_index_append(spark, path, clone).count() == 0


def test_minhash_index_rebuild_drops_chain_dups(spark, tmp_path):
    """rebuild_minhash_index (r13 verdict ask #5) closes both holes the
    incremental lifecycle leaves open: build never dedups the corpus
    (internal near-dups persist) and the append rule is non-transitive.
    Rebuilding keeps one canonical (min-id) doc per near-dup CLUSTER —
    A~B and B~C collapse to A even when A~C was never a verified pair."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
        rebuild_minhash_index,
    )

    corpus = spark.createDataFrame(
        [
            # 0 ~ 5 (9/11) and 5 ~ 7 (9/11): one cluster {0, 5, 7}
            (0, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
            (5, "a1 a2 a3 a4 a5 a6 a7 a8 a9 z1"),
            (7, "a1 a2 a3 a4 a5 a6 a7 a8 a9 z2"),
            (10, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path, **_mh_index_kw())
    assert sorted(
        r.doc_id for r in minhash_index_append(spark, path, batch).collect()
    ) == [100]
    kept = rebuild_minhash_index(spark, path)
    assert sorted(r.doc_id for r in kept.collect()) == [0, 10, 100]
    for sub in ("bands", "sigs", "terms", "texts"):
        ids = {
            r.doc_id
            for r in spark.read.parquet(f"{path}/{sub}")
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert ids == {0, 10, 100}, sub


def test_minhash_index_store_tables_consistent(spark, tmp_path):
    """append ≡ rebuild across ALL four store tables (bands was pinned
    since r13; sigs/terms/texts joined the store in r14): the appended
    store's contents equal a from-scratch build over corpus ∪ survivors."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
    )

    corpus, batch = _mh_fixture(spark)
    kw = _mh_index_kw()
    p_inc = str(tmp_path / "inc")
    build_minhash_index(corpus, p_inc, **kw)
    surv = minhash_index_append(spark, p_inc, batch)
    p_full = str(tmp_path / "full")
    build_minhash_index(corpus.unionByName(surv), p_full, **kw)
    for sub in ("bands", "sigs", "terms", "texts"):
        rows = lambda p: {  # noqa: E731
            tuple(r)
            for r in spark.read.parquet(f"{p}/{sub}").collect()
        }
        assert rows(p_inc) == rows(p_full), sub


def test_minhash_torn_append_replay_is_repaired(spark, tmp_path):
    """Crash-consistency contract (r13 ADVICE, medium): texts/ is the
    commit surface written LAST — a crash after the bands/sigs/terms
    appends leaves orphan rows whose ids the replayed epoch re-processes.
    The replay must see the pre-crash store (dirty-path commit-surface
    semi-join + defensive dropDuplicates), produce the same survivors,
    and leave a store whose LOGICAL contents match a clean single append;
    compaction physically removes the duplicated rows."""
    import os
    import shutil

    from pyspark_etl_twitter_spark.operators.dedup import (
        _mh_is_clean,
        _mh_marker,
        build_minhash_index,
        compact_minhash_index,
        minhash_index_append,
    )

    corpus, batch = _mh_fixture(spark)
    kw = _mh_index_kw()
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path, **kw)
    assert _mh_is_clean(path)  # fresh build commits the clean marker
    # snapshot the commit surface, then 'crash' right before it commits:
    # run a full append and roll texts/ back to the snapshot. A real
    # crash happens AFTER the append cleared the marker and BEFORE it
    # re-set it, so the simulated torn store must have no marker either.
    shutil.copytree(f"{path}/texts", str(tmp_path / "texts_snap"))
    first = sorted(
        r.doc_id for r in minhash_index_append(spark, path, batch).collect()
    )
    shutil.rmtree(f"{path}/texts")
    shutil.copytree(str(tmp_path / "texts_snap"), f"{path}/texts")
    os.unlink(_mh_marker(path))
    assert not _mh_is_clean(path)

    # replay the same batch against the torn store
    again = sorted(
        r.doc_id for r in minhash_index_append(spark, path, batch).collect()
    )
    assert again == first == [110, 120]

    # logical contents equal a clean single append on a fresh store
    clean = str(tmp_path / "clean")
    build_minhash_index(corpus, clean, **kw)
    minhash_index_append(spark, clean, batch)
    for sub in ("bands", "sigs", "terms", "texts"):
        rows = lambda p: {  # noqa: E731
            tuple(r) for r in spark.read.parquet(f"{p}/{sub}").collect()
        }
        assert rows(path) == rows(clean), sub

    # a dirty-started append leaves the store dirty (physical residue
    # remains); the torn store carries physical duplicates until
    # compaction, which removes them and restores the clean marker
    assert not _mh_is_clean(path)
    n_dup = (
        spark.read.parquet(f"{path}/bands").count()
        - spark.read.parquet(f"{path}/bands").distinct().count()
    )
    assert n_dup > 0
    compact_minhash_index(spark, path)
    assert _mh_is_clean(path)
    b = spark.read.parquet(f"{path}/bands")
    assert b.count() == b.distinct().count()

    # and a follow-up probe behaves exactly like one on the clean store
    probe = spark.createDataFrame(
        [(500, "d1 d2 d3 d4 d5 d6 d7 d8 d9 z5")], "doc_id long, text string"
    )
    assert minhash_index_append(spark, path, probe).count() == 0


def _tear_append(spark, tmp_path, path, batch):
    """Run a full append then roll texts/ back and drop the clean marker —
    the state a crash right before the texts/ commit leaves behind."""
    import os
    import shutil
    import uuid

    from pyspark_etl_twitter_spark.operators.dedup import (
        _mh_marker,
        minhash_index_append,
    )

    snap = str(tmp_path / f"texts_snap_{uuid.uuid4().hex[:8]}")
    shutil.copytree(f"{path}/texts", snap)
    minhash_index_append(spark, path, batch)
    shutil.rmtree(f"{path}/texts")
    shutil.copytree(snap, f"{path}/texts")
    if os.path.exists(_mh_marker(path)):
        os.unlink(_mh_marker(path))


def test_minhash_torn_append_orphan_never_drops_later_batch(spark, tmp_path):
    """r14 ADVICE (medium): an orphan of a torn append must never act as
    an indexed partner for a DIFFERENT later batch — without the
    commit-surface guard the later doc is dropped as the orphan's
    near-dup while the orphan's text was never committed, losing the
    content on BOTH sides. With the guard the later doc survives; the
    eventual replay of the crashed batch then near-dups against it and
    is dropped, so the content lands exactly once."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
    )

    corpus, _ = _mh_fixture(spark)
    kw = _mh_index_kw()
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path, **kw)
    batch_x = spark.createDataFrame(
        [(110, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")], "doc_id long, text string"
    )
    _tear_append(spark, tmp_path, path, batch_x)

    # a DIFFERENT batch whose doc near-dups the orphan's text (9/11
    # unigram Jaccard) must SURVIVE: the orphan is not committed
    batch_y = spark.createDataFrame(
        [(200, "d1 d2 d3 d4 d5 d6 d7 d8 d9 z9")], "doc_id long, text string"
    )
    surv_y = sorted(
        r.doc_id for r in minhash_index_append(spark, path, batch_y).collect()
    )
    assert surv_y == [200]
    texts = {
        r.doc_id for r in spark.read.parquet(f"{path}/texts").collect()
    }
    assert 200 in texts and 110 not in texts

    # the crashed batch's replay now near-dups the committed 200 -> dropped
    surv_x = sorted(
        r.doc_id for r in minhash_index_append(spark, path, batch_x).collect()
    )
    assert surv_x == []
    texts = {
        r.doc_id for r in spark.read.parquet(f"{path}/texts").collect()
    }
    assert 200 in texts and 110 not in texts  # content landed exactly once


def test_minhash_rebuild_on_torn_store_ignores_orphans(spark, tmp_path):
    """r14 ADVICE (medium), rebuild half: a maintenance rebuild of a torn
    store must not cluster orphans — a text-less orphan could otherwise
    become a cluster's canonical (min id) and committed content would be
    dropped in its favor. The rebuild's output and the rewritten tables
    must contain committed ids only, and the store comes out clean."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        _mh_is_clean,
        build_minhash_index,
        rebuild_minhash_index,
    )

    corpus, _ = _mh_fixture(spark)
    kw = _mh_index_kw()
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path, **kw)
    # orphan id 5 is SMALLER than every committed near-dup partner id and
    # its text near-dups corpus doc 10 — an unguarded rebuild would
    # canonicalize 5 (min id) and drop committed doc 10
    orphan = spark.createDataFrame(
        [(5, "b1 b2 b3 b4 b5 b6 b7 b8 b9 z7")], "doc_id long, text string"
    )
    _tear_append(spark, tmp_path, path, orphan)

    kept = {r.doc_id for r in rebuild_minhash_index(spark, path).collect()}
    assert kept == {0, 10, 20}  # committed corpus intact, orphan ignored
    assert _mh_is_clean(path)
    for sub in ("bands", "sigs", "terms", "texts"):
        ids = {
            r.doc_id
            for r in spark.read.parquet(f"{path}/{sub}")
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert ids == {0, 10, 20}, sub


def test_sig_match_estimate_counts_matched_positions(spark):
    """The prefilter's signature-estimated Jaccard is matched-positions /
    num_hashes — exact integer compares, one division."""
    from pyspark_etl_twitter_spark.operators.dedup import _sig_match_estimate

    df = spark.createDataFrame(
        [(1, 2, 3, 4, 1, 9, 3, 9)],
        "a0 long, a1 long, a2 long, a3 long, b0 long, b1 long, b2 long, b3 long",
    )
    got = df.select(_sig_match_estimate(4).alias("est")).first().est
    assert got == 0.5


def test_cdc_boundaries_match_python_reference(spark):
    """Differential pin of the gear rolling hash: an independent pure-
    Python fold (md5 gear mod 2^31−1, windowed left fold ×31) computes
    each random doc's boundary count and chunk reassembly; on an
    all-unique corpus cdc_chunk_dedup must report exactly that
    n_chunks with full-identity reassembly (n_kept == n_chunks,
    new_text == text)."""
    import hashlib
    import random

    from pyspark_etl_twitter_spark.operators.dedup import (
        CDC_HASH_BASE,
        CDC_HASH_MOD,
        cdc_chunk_dedup,
    )

    window, divisor = 4, 8

    def gear(tok: str) -> int:
        h = hashlib.md5(f"0:{tok}".encode()).hexdigest()[:15]
        return int(h, 16) % CDC_HASH_MOD

    def n_chunks_py(toks: list[str]) -> int:
        g = [gear(t) for t in toks]
        n = 0
        for i in range(1, len(g) + 1):
            acc = 0
            for v in g[max(0, i - window) : i]:
                acc = (acc * CDC_HASH_BASE + v) % CDC_HASH_MOD
            if acc % divisor == 0 or i == len(g):
                n += 1
        return n

    rng = random.Random(1414)
    rows, expected = [], {}
    for d in range(25):
        # doc-unique token universe => no cross-doc chunk dedup
        toks = [f"d{d}_w{rng.randrange(50)}" for _ in range(rng.randrange(1, 120))]
        rows.append((d, " ".join(toks)))
        expected[d] = n_chunks_py(toks)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in cdc_chunk_dedup(docs).collect()}
    texts = dict(rows)
    for d, exp in expected.items():
        assert got[d].n_chunks == exp, f"doc {d}: {got[d].n_chunks} != {exp}"
        assert got[d].n_kept == exp
        assert got[d].new_text == texts[d]


def test_cdc_chunks_realign_after_insertion(spark):
    """THE property content-defined chunking exists for: inserting one
    token near the front of a duplicated document re-aligns the chunk
    boundaries within one window, so almost all of the copy's chunks
    still dedup away — while fixed-width segments shift out of phase and
    duplicate text survives wholesale."""
    import random

    from pyspark_etl_twitter_spark.operators.dedup import (
        cdc_chunk_dedup,
        segment_dedup,
    )

    rng = random.Random(41)
    base_toks = [f"w{rng.randrange(10_000)}" for _ in range(400)]
    shifted = ["INSERTED"] + base_toks
    docs = spark.createDataFrame(
        [(0, " ".join(base_toks)), (1, " ".join(shifted))],
        "doc_id long, text string",
    )
    cdc = {r.doc_id: r for r in cdc_chunk_dedup(docs).collect()}
    seg = {r.doc_id: r for r in segment_dedup(docs).collect()}
    # original keeps everything on both schemes
    assert cdc[0].n_kept == cdc[0].n_chunks
    assert seg[0].n_kept == seg[0].n_segments
    # the shifted copy: CDC keeps only the few chunks the insertion
    # touched; fixed windows keep nearly all of the duplicate text
    cdc_surv = cdc[1].n_kept / cdc[1].n_chunks
    seg_surv = seg[1].n_kept / seg[1].n_segments
    assert cdc_surv < 0.15, f"CDC kept {cdc_surv:.2%} of a shifted dup"
    assert seg_surv > 0.85, f"fixed windows kept only {seg_surv:.2%}"


def test_cdc_chunk_dedup_rebuild_roundtrip(spark):
    """Chunks partition each document exactly (no token lost or
    duplicated): a corpus with no cross-doc duplication rebuilds to the
    original text, and chunk lengths track the divisor."""
    from pyspark_etl_twitter_spark.operators.dedup import cdc_chunk_dedup

    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"u{i}x{rng.randrange(100_000)}" for _ in range(50 + i)))
        for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in cdc_chunk_dedup(docs).collect()}
    for i, text in rows:
        assert out[i].new_text == text
        assert out[i].n_kept == out[i].n_chunks
        n_toks = len(text.split(" "))
        # expected chunk length = divisor (8); allow a loose band
        assert 1 <= out[i].n_chunks <= n_toks
