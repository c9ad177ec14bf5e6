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
