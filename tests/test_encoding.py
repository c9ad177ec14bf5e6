"""Vocab build, token-id encoding, and context-window chunking."""

from pyspark_etl_twitter_spark.operators.encoding import (
    OOV_ID,
    build_vocab,
    chunk_documents,
    encode_documents,
)


def test_vocab_rank_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "b a a c b a"), (1, "c b")], "doc_id long, text string"
    )
    rows = {r.term: r for r in build_vocab(docs).collect()}
    # a:3 occ, b:3 occ (tie -> 'a' first), c:2
    assert rows["a"].vocab_id == 0 and rows["b"].vocab_id == 1
    assert rows["c"].vocab_id == 2
    assert rows["a"].n_docs == 1 and rows["b"].n_docs == 2


def test_encode_order_oov_and_empty(spark):
    docs = spark.createDataFrame(
        [(0, "b a a"), (1, ""), (2, "a zzz b")], "doc_id long, text string"
    )
    vocab = build_vocab(
        spark.createDataFrame([(9, "a a b")], "doc_id long, text string")
    )  # a=0, b=1; zzz OOV
    got = {r.doc_id: r.token_ids for r in encode_documents(docs, vocab).collect()}
    assert got[0] == [1, 0, 0]          # token order preserved
    assert got[1] == []                 # empty doc -> empty array
    assert got[2] == [0, OOV_ID, 1]     # OOV -> -1


def test_chunking_budget_and_tail(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, "x"), (2, "")],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4).collect()
    )
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (0, 1, 4, "t4 t5 t6 t7"),
        (0, 2, 2, "t8 t9"),
        (1, 0, 1, "x"),
    ]  # empty doc 2 produces no chunks; tail chunk short


def test_chunk_roundtrip_property(spark):
    """Invariants over random docs: chunks concatenate back to the token
    stream, every chunk meets the budget, only the last may be short."""
    import random

    rng = random.Random(0)
    docs = [
        (i, " ".join(f"w{rng.randint(0, 30)}" for _ in range(rng.randint(0, 40))))
        for i in range(50)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    rows = chunk_documents(sdf, chunk_tokens=7).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.n_chunk_tokens, r.chunk_text))
    for doc_id, text in docs:
        toks = text.split()
        chunks = sorted(by_doc.get(doc_id, []))
        assert " ".join(c[2] for c in chunks).split() == toks
        for cid, (chunk_id, n, _) in enumerate(chunks):
            assert chunk_id == cid
            assert n == 7 or cid == len(chunks) - 1


def test_encode_decode_roundtrip_property(spark):
    """Encoding against a vocab built from the same corpus must decode back
    to the exact token streams (no OOV possible)."""
    import random

    rng = random.Random(1)
    docs = [
        (i, " ".join(f"w{rng.randint(0, 20)}" for _ in range(rng.randint(0, 25))))
        for i in range(40)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    vocab = build_vocab(sdf)
    id2term = {r.vocab_id: r.term for r in vocab.collect()}
    got = {r.doc_id: r.token_ids for r in encode_documents(sdf, vocab).collect()}
    for doc_id, text in docs:
        assert [id2term[v] for v in got[doc_id]] == text.split()
        assert OOV_ID not in got[doc_id]


def test_training_mix_rate_monotonicity(spark):
    """For the same source, a higher rate must keep a superset of the docs
    a lower rate keeps (threshold semantics, not resampling)."""
    from pyspark_etl_twitter_spark.operators.packing import training_mix

    docs = spark.createDataFrame(
        [(i, "s") for i in range(5000)], "doc_id long, source string"
    )
    lo = {r.doc_id for r in training_mix(docs, {"s": 0.2}).collect()}
    hi = {r.doc_id for r in training_mix(docs, {"s": 0.6}).collect()}
    assert lo < hi


def test_chunk_overlap_coverage_and_stride(spark):
    from pyspark_etl_twitter_spark.operators.encoding import (
        chunk_documents_overlap,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    rows = chunk_documents_overlap(docs, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    # doc 1: windows [0:4),[3:7),[6:10),[9:10) — every token covered, 1-token
    # overlap between consecutive windows
    assert [t for _, t in sorted(by_doc[1])] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9",
    ]
    assert [t for _, t in sorted(by_doc[2])] == ["a b"]
    assert 3 not in by_doc  # empty doc → no chunks
    covered = set()
    for _, t in by_doc[1]:
        covered.update(t.split())
    assert covered == {f"t{i}" for i in range(10)}


def test_bpe_encode_matches_reference_algorithm(spark):
    from pyspark_etl_twitter_spark.operators.encoding import bpe_encode_documents

    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "hello low"), (3, "")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.tokens for r in bpe_encode_documents(docs, merges).collect()}
    # 'low' merges fully; 'lower' = low+er merged by rank 4; 'lowest' has
    # no (low,e)/(e,s) merges → low e s t
    assert got[1] == ["low", "lower", "low", "e", "s", "t"]
    assert got[2] == ["h", "e", "l", "lo", "low"]
    assert got[3] == []

    # merge priority: rank order, not left-to-right — ('e','r') fires
    # inside 'lower' before ('lo','w') would block it? verify greedy
    # lowest-rank semantics on a crafted word
    merges2 = [("a", "b"), ("b", "c")]
    docs2 = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    got2 = bpe_encode_documents(docs2, merges2).collect()[0].tokens
    assert got2 == ["ab", "c"]  # rank 0 wins over rank 1

    plan = (
        bpe_encode_documents(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan and "Exchange" not in plan


def _bruteforce_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Independent reference trainer: operates on the FULL expanded token
    list (every occurrence), not the word-frequency table the operator
    collects — same answer by construction, different code path."""
    seqs = [list(w) for t in texts for w in t.split()]
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == best[0] and s[i + 1] == best[1]:
                    s[i : i + 2] = [s[i] + s[i + 1]]
                else:
                    i += 1
    return merges


def test_bpe_train_matches_bruteforce_reference(spark):
    from pyspark_etl_twitter_spark.operators.encoding import bpe_train

    texts = [
        "low lower lowest low low",
        "newer newest new new new",
        "wider wide widest lower",
        "hello hello help hero",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = bpe_train(docs, n_merges=12)
    assert got == _bruteforce_bpe(texts, 12)
    # partitioning invariance: the word-count pass commutes with layout
    assert bpe_train(docs.repartition(7), n_merges=12) == got


def test_bpe_train_tie_break_lexicographic(spark):
    from pyspark_etl_twitter_spark.operators.encoding import bpe_train

    # "zx" and "ab" both occur exactly twice; ("a","b") < ("z","x")
    docs = spark.createDataFrame([(1, "zx ab zx ab")], ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=1)
    assert merges == [("a", "b")]


def test_bpe_train_then_encode_compresses(spark):
    """Trained merges feed bpe_encode_documents: token counts are
    monotonically non-increasing in n_merges, and a frequent word
    collapses to a single token once its merges are learned."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.encoding import (
        bpe_encode_documents,
        bpe_train,
    )
    from pyspark_etl_twitter_spark.sources.catalog import load_table
    from tests.conftest import SF_TINY

    docs = load_table(spark, SF_TINY, "documents").limit(200)

    def total(merges):
        return (
            bpe_encode_documents(docs, merges)
            .agg(F.sum(F.size("tokens")))
            .collect()[0][0]
        )

    m50 = bpe_train(docs, n_merges=50)
    m200 = bpe_train(docs, n_merges=200)
    assert m200[:50] == m50  # merge list is prefix-stable in n_merges
    base, t50, t200 = total([]), total(m50), total(m200)
    assert base >= t50 >= t200
    # the corpus's most frequent word ends up a single symbol
    top_word = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter("w <> ''")
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), "w")
        .first()["w"]
    )
    enc = {
        r.doc_id: r.tokens
        for r in bpe_encode_documents(
            spark.createDataFrame([(1, top_word)], ["doc_id", "text"]), m200
        ).collect()
    }
    assert enc[1] == [top_word]


def test_hashed_embedding_matches_python_oracle(spark):
    """The md5 hashing-trick embedding must equal a pure-Python
    recomputation (bucket, sign, tf accumulation, L2 normalization)."""
    import hashlib
    import math

    from pyspark_etl_twitter_spark.operators.encoding import hashed_embedding

    texts = {
        1: "alpha beta gamma alpha",
        2: "delta",
        3: "",  # zero vector
        4: "alpha beta gamma alpha",  # duplicate of 1
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    dim = 16
    got = {
        r.doc_id: list(r.embedding)
        for r in hashed_embedding(docs, dim=dim).collect()
    }

    def py_embed(text):
        v = [0.0] * dim
        for term in [t for t in text.split(" ") if t]:
            h = hashlib.md5(term.encode()).hexdigest()
            v[int(h[:8], 16) % dim] += (int(h[8], 16) % 2) * 2 - 1
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    for doc_id, text in texts.items():
        want = py_embed(text)
        assert len(got[doc_id]) == dim
        for a, b in zip(got[doc_id], want):
            assert abs(a - b) < 1e-6, (doc_id, text)
    assert got[1] == got[4]  # determinism: identical text -> identical vector


def test_hashed_embedding_feeds_the_ann_index(spark, tmp_path):
    """End-to-end text -> embed -> persisted LSH index -> probe: a one-word
    edit of a document stays its nearest indexed neighbor."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.encoding import hashed_embedding
    from pyspark_etl_twitter_spark.operators.similarity import (
        build_lsh_index,
        lsh_probe_indexed,
    )
    from pyspark_etl_twitter_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    base = docs.filter(F.col("doc_id") == 0).first()
    edited = spark.createDataFrame(
        [(10_000, base.text + " zzedit", "en", "synthetic", len(base.text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = hashed_embedding(docs.unionByName(edited), dim=64).withColumnRenamed(
        "doc_id", "vec_id"
    )
    idx = str(tmp_path / "textlsh")
    build_lsh_index(emb, idx, n_planes=6, max_queries=1)
    # the synthetic corpus contains natural template near-dups of doc 0
    # (cos ~0.99), so the planted one-word edit must place top-3 with a
    # very high score rather than strictly first
    top3 = (
        lsh_probe_indexed(spark, idx, n_queries=1, k=3)
        .filter(F.col("q_id") == 0)
        .collect()
    )
    by_id = {r.neighbor_id: r.cos_sim for r in top3}
    assert 10_000 in by_id
    assert by_id[10_000] > 0.95


def test_bpe_train_warns_on_truncated_word_table(spark):
    """The frequency-cap approximation must be LOUD (r10 ADVICE): capping
    the word table below the distinct-word count, or filtering with
    min_count>1, issues a UserWarning; the default full-table train does
    not."""
    import warnings

    from pyspark.sql import Row

    from pyspark_etl_twitter_spark.operators.encoding import bpe_train

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta w{i}") for i in range(20)]
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bpe_train(docs, n_merges=2, max_words=5)
    assert any("truncated by max_words" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bpe_train(docs, n_merges=2, min_count=2)
    assert any("filtered by min_count" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bpe_train(docs, n_merges=2)
    assert not [w for w in caught if issubclass(w.category, UserWarning)]


def test_bpe_fixed_expr_equals_greedy_loop(spark):
    """The replace-chain unroll (bpe_apply_fixed_expr) must equal the
    greedy lowest-rank-first loop (bpe_encode_documents) — on the real
    corpus with its trained merges AND on planted worst cases: overlap
    runs (aaa/aaaa with merge (a,a)), empty docs, stray delimiter
    chars, multi-level fused words."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.encoding import (
        bpe_apply_fixed_expr,
        bpe_encode_documents,
        bpe_train,
        validate_bpe_merge_chain,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_train(docs, n_merges=24)
    validate_bpe_merge_chain(merges)
    a = {r.doc_id: r.tokens for r in bpe_encode_documents(docs, merges).collect()}
    b = {
        r.doc_id: r.tokens
        for r in docs.select(
            "doc_id", bpe_apply_fixed_expr("text", merges).alias("tokens")
        ).collect()
    }
    assert a == b

    tricky = spark.createDataFrame(
        [
            (1, "aaa aaaa a"),
            (2, ""),
            (3, "\x1f\x1f"),
            (4, "table scan data agg"),
        ],
        "doc_id long, text string",
    )
    tm = [
        ("a", "a"), ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
        ("s", "c"), ("sc", "a"), ("sca", "n"), ("a", "g"), ("ag", "g"),
    ]
    validate_bpe_merge_chain(tm)
    ta = {r.doc_id: r.tokens for r in bpe_encode_documents(tricky, tm).collect()}
    tb = {
        r.doc_id: r.tokens
        for r in tricky.select(
            "doc_id", bpe_apply_fixed_expr("text", tm).alias("tokens")
        ).collect()
    }
    assert ta == tb
    assert ta[1] == ["aa", "a", "aa", "aa", "a"]  # leftmost non-overlap
    assert ta[2] == [] and ta[3] == []            # empty / delimiter-only
    assert ta[4][0] == "table" and ta[4][1] == "scan"


def test_bpe_merge_chain_validation_rejects_untrained_lists(spark):
    """A pair list violating the training invariant (a side that is
    neither a char nor an earlier output) must be rejected loudly —
    the sequential-replace unroll is only sound for trained chains."""
    import pytest

    from pyspark_etl_twitter_spark.operators.encoding import (
        BPE_DELIM,
        validate_bpe_merge_chain,
    )

    with pytest.raises(ValueError, match="not a valid BPE training chain"):
        validate_bpe_merge_chain([("ab", "c")])  # 'ab' never produced
    with pytest.raises(ValueError, match="delimiter"):
        validate_bpe_merge_chain([(BPE_DELIM, "x")])
    # valid: multi-char sides appearing after their producing merge
    validate_bpe_merge_chain([("a", "b"), ("ab", "c"), ("c", "ab")])


def test_bpe_train_portable_equals_driver_trainer(spark):
    """The distributed trainer must reproduce the driver trainer's merge
    list EXACTLY — same weighted pair counts, same (count desc, pair
    lexicographic) tie rule, same leftmost non-overlapping fuse, same
    early-termination semantics — on the real corpus AND on a planted
    overlap corpus where within-word repeated pairs and pair exhaustion
    both occur."""
    from pyspark_etl_twitter_spark.operators.encoding import (
        bpe_train,
        bpe_train_portable,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = bpe_train(docs, n_merges=12, max_words=100_000)
    got = [
        (r["left"], r["right"])
        for r in sorted(
            bpe_train_portable(docs, n_merges=12).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got == want

    tricky = spark.createDataFrame(
        [(1, "aaaa aa ab"), (2, "ab ab b"), (3, "")],
        "doc_id long, text string",
    )
    # n_merges far beyond exhaustion: the portable trainer must emit
    # exactly as many merges as the driver trainer (break == no-op tail)
    want_t = bpe_train(tricky, n_merges=20, max_words=100_000)
    got_t = [
        (r["left"], r["right"])
        for r in sorted(
            bpe_train_portable(tricky, n_merges=20).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got_t == want_t
