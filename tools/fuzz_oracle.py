"""Differential fuzzing: random queries executed by both Spark and DuckDB
on the same data, results compared exactly.

Shapes: random filter+aggregate over lineitem/orders, window queries with a
guaranteed total order, orders⋈lineitem joins, two-branch set operations
(UNION/INTERSECT/EXCEPT [ALL]), and random synthetic documents pushed
through the full text pipeline (tokenize → stop-filter → term frequency) in
Spark vs a DuckDB twin of the tokenizer. Catches semantic drift (null
handling, comparison/casting rules, aggregate typing, regex/split edge
cases) that curated queries can sidestep.

Text-fuzz alphabet is deliberately ASCII-only (letters, digits, punctuation
and the whitespace set ``space \\t \\n \\r \\f``): inside that alphabet
Python's re, Java's regex with (?Ud), and DuckDB's RE2 agree on ``\\s``/
``\\S``/``.``/alternation, so any mismatch is a real engine bug, not a
known Unicode-class divergence (those are covered by the Spark-vs-Python
tokenizer fuzz in tests/, which needs no third engine).

Usage: python tools/fuzz_oracle.py [n_cases] [seed] [sf_dir]
"""

from __future__ import annotations

import math
import random
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_etl_twitter_spark.session import get_session  # noqa: E402

TABLES = {
    "lineitem": {
        "numeric": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "string": ["l_returnflag", "l_linestatus"],
        "key": ["l_orderkey", "l_suppkey", "l_partkey", "l_linenumber"],
        "group": ["l_returnflag", "l_linestatus", "l_suppkey"],
    },
    "orders": {
        "numeric": ["o_totalprice"],
        "string": ["o_orderstatus", "o_orderpriority"],
        "key": ["o_orderkey", "o_custkey"],
        "group": ["o_orderstatus", "o_orderpriority", "o_custkey"],
    },
}


def _rand_predicate(rng, spec, stats):
    kind = rng.choice(["num_cmp", "str_eq", "key_mod", "num_between", "str_in"])
    if kind == "num_cmp":
        c = rng.choice(spec["numeric"])
        lo, hi = stats[c]
        v = round(rng.uniform(lo, hi), 3)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{c} {op} {v}"
    if kind == "num_between":
        c = rng.choice(spec["numeric"])
        lo, hi = stats[c]
        a, b = sorted((round(rng.uniform(lo, hi), 3), round(rng.uniform(lo, hi), 3)))
        return f"{c} BETWEEN {a} AND {b}"
    if kind == "str_eq":
        c = rng.choice(spec["string"])
        v = rng.choice(stats[c])
        return f"{c} {'=' if rng.random() < 0.7 else '<>'} '{v}'"
    if kind == "str_in":
        c = rng.choice(spec["string"])
        vs = rng.sample(stats[c], k=min(len(stats[c]), rng.randint(1, 3)))
        inner = ", ".join(f"'{v}'" for v in vs)
        return f"{c} {'IN' if rng.random() < 0.7 else 'NOT IN'} ({inner})"
    c = rng.choice(spec["key"])
    m = rng.randint(2, 17)
    return f"{c} % {m} = {rng.randint(0, m - 1)}"


def _agg_exprs(rng, spec):
    aggs = ["count(*) AS n"]
    for c in rng.sample(spec["numeric"] + spec["key"], k=rng.randint(1, 3)):
        op = rng.choice(["sum", "min", "max", "avg"])
        if op == "avg":
            aggs.append(f"round(avg({c}), 6) AS avg_{c}")
        elif op == "sum":
            aggs.append(f"round(sum(CAST({c} AS DOUBLE)), 2) AS sum_{c}")
        else:
            aggs.append(f"{op}({c}) AS {op}_{c}")
    return list(dict.fromkeys(aggs))


def _rand_query(rng, table, spec, stats):
    preds = [_rand_predicate(rng, spec, stats) for _ in range(rng.randint(1, 3))]
    joiner = " AND " if rng.random() < 0.7 else " OR "
    where = joiner.join(f"({p})" for p in preds)
    group = rng.sample(spec["group"], k=rng.randint(1, 2))
    gcols = ", ".join(group)
    acols = ", ".join(_agg_exprs(rng, spec))
    having = ""
    if rng.random() < 0.3:
        having = f" HAVING count(*) >= {rng.randint(1, 5)}"
    return f"SELECT {gcols}, {acols} FROM {table} WHERE {where} GROUP BY {gcols}{having}"


def _rand_window_query(rng, stats):
    """Ranking/frame windows with a guaranteed total order (unique key in
    the ORDER BY tail) so results are engine-independent."""
    table = rng.choice(list(TABLES))
    spec = TABLES[table]
    part = rng.choice(spec["group"])
    val = rng.choice(spec["numeric"])
    uniq = "o_orderkey" if table == "orders" else "l_orderkey, l_linenumber"
    order = f"{val} DESC, {uniq}"
    fn = rng.choice(
        [
            "row_number()",
            "rank()",
            "dense_rank()",
            f"round(sum({val}) OVER (PARTITION BY {part} ORDER BY {order} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)",
            f"lag({val}, 1, 0.0)",
            f"lead({val}, 1, 0.0)",
        ]
    )
    if "OVER" in fn:
        expr = f"{fn} AS w"
    else:
        expr = f"{fn} OVER (PARTITION BY {part} ORDER BY {order}) AS w"
    pred = _rand_predicate(rng, spec, stats[table])
    limit_rank = rng.randint(2, 6)
    return (
        f"SELECT * FROM (SELECT {part}, {uniq}, {expr},"
        f" row_number() OVER (PARTITION BY {part} ORDER BY {order}) AS rn"
        f" FROM {table} WHERE ({pred})) WHERE rn <= {limit_rank}"
    )


def _rand_join_query(rng, stats):
    """orders ⋈ lineitem with predicates on both sides + grouped aggregates."""
    po = _rand_predicate(rng, TABLES["orders"], stats["orders"])
    pl = _rand_predicate(rng, TABLES["lineitem"], stats["lineitem"])
    jt = rng.choice(["JOIN", "LEFT JOIN", "JOIN", "JOIN"])
    group = rng.choice(["o_orderstatus", "o_orderpriority", "l_returnflag"])
    if jt == "LEFT JOIN" and group.startswith("l_"):
        group = "o_orderstatus"  # left-join null groups are fine, but keep it simple
    aggs = ["count(*) AS n", "count(l_orderkey) AS n_items",
            "round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS sum_price"]
    return (
        f"SELECT {group}, {', '.join(aggs)} FROM orders {jt} lineitem"
        f" ON o_orderkey = l_orderkey AND ({pl})"
        f" WHERE ({po}) GROUP BY {group}"
    )


def _rand_setop_query(rng, stats):
    """Two same-table branches with independent predicates under a random
    set operation — same-table branches guarantee the branches overlap so
    INTERSECT/EXCEPT exercise real matching, not empty sets."""
    table = rng.choice(list(TABLES))
    spec = TABLES[table]
    cols = [rng.choice(spec["string"]), rng.choice(spec["key"])]
    proj = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cols))
    p1 = _rand_predicate(rng, spec, stats[table])
    p2 = _rand_predicate(rng, spec, stats[table])
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
    )
    return (
        f"SELECT {proj} FROM {table} WHERE ({p1})"
        f" {op} SELECT {proj} FROM {table} WHERE ({p2})"
    )


# --- text-pipeline fuzz: random documents through tokenize/stop/TF --------

_WORDS = [
    "the", "Quick", "BROWN", "fox", "Jumps", "over", "lazy", "dogs", "spark",
    "Tweet", "LOVE", "hate", "data", "pipeline", "model", "learning", "great",
    "bad", "happy", "sad", "stream", "batch", "Shuffle", "join",
]
_STOPS = ["i", "me", "My", "WE", "our", "you", "it", "is", "are", "was", "a",
          "an", "the", "and", "or", "not", "no", "too", "very"]
_WS = [" ", "\t", "\n", "\r", "\f"]
_PUNCT = "!?#@$%^&*()-_=+[]{};:'\",<.>/\\|~`"


def _rand_token(rng):
    roll = rng.random()
    if roll < 0.40:
        return rng.choice(_WORDS)
    if roll < 0.55:
        return rng.choice(_STOPS)
    if roll < 0.65:  # URL-ish (reference scrub quirks: http\S+ / www.\S+)
        head = rng.choice(["http", "https", "www.", "wwwX", "httpx"])
        tail = "".join(
            rng.choice("abcz019:/._-") for _ in range(rng.randint(0, 6))
        )
        return head + tail
    if roll < 0.80:  # word with punct/digit infix — partially scrubbed
        w = rng.choice(_WORDS)
        pos = rng.randint(0, len(w))
        return w[:pos] + rng.choice(_PUNCT + "0123456789") + w[pos:]
    if roll < 0.90:  # pure noise
        return "".join(rng.choice(_PUNCT + "0123456789") for _ in range(rng.randint(1, 5)))
    return ""


def _rand_doc(rng):
    parts = []
    for _ in range(rng.randint(0, 12)):
        parts.append(_rand_token(rng))
        parts.append(rng.choice(_WS) * rng.randint(1, 2))
    return "".join(parts)


def _duck_stoplist_sql():
    from pyspark_etl_twitter_spark.functions.stopwords import ENGLISH_STOPWORDS

    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in ENGLISH_STOPWORDS) + "]"


def _duck_tf_sql():
    """DuckDB twin of tokenize → remove_stopwords → TF. Same regexes as
    functions/text.py modulo the ASCII-whitespace spelling (see module
    docstring); tokens are lowercase after clean, so the stop filter
    compares directly against the lowercase stoplist."""
    strip = r"'^[ \t\n\r\f]+|[ \t\n\r\f]+$'"
    clean = r"'[^A-Za-z\n ]|(http[^ \t\n\r\f]+)|(www.[^ \t\n\r\f]+)'"
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(list_filter(
             regexp_split_to_array(
               regexp_replace(
                 regexp_replace(lower(text), {strip}, '', 'g'),
                 {clean}, '', 'g'),
               '[\n ]+'),
             t -> t <> ''),
             t -> NOT list_contains({_duck_stoplist_sql()}, t))) AS term
  FROM fuzz_docs)
SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
FROM toks GROUP BY doc_id, term
"""


def _text_fuzz_batch(rng, spark, con, n_docs=40):
    """One batch: fresh random docs registered in both engines, engine TF
    (native column expressions) vs DuckDB-SQL TF, exact compare."""
    import pandas as pd

    from pyspark_etl_twitter_spark.functions.text import remove_stopwords, tokenize

    pdf = pd.DataFrame(
        {"doc_id": range(n_docs), "text": [_rand_doc(rng) for _ in range(n_docs)]}
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select("doc_id", F.explode(remove_stopwords(tokenize("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    )
    con.register("fuzz_docs", pdf)
    want = con.execute(_duck_tf_sql()).fetchall()
    a = sorted((int(r.doc_id), r.term, int(r.tf)) for r in got)
    b = sorted((int(d), t, int(c)) for d, t, c in want)
    if a != b:
        extra_s = set(a) - set(b)
        extra_d = set(b) - set(a)
        return False, f"spark-only={sorted(extra_s)[:5]} duck-only={sorted(extra_d)[:5]}"
    return True, ""


def _ngram_fuzz_batch(rng, spark, con, n_docs=40):
    """Word-n-gram parity batch: random docs through the engine's
    ``shingle_array`` (single-space tokens, no empties) vs the DuckDB
    list-comprehension twin used by the decontamination / bigram-profile
    oracles. n is drawn 2..5 per batch."""
    import pandas as pd

    from pyspark_etl_twitter_spark.operators.dedup import shingle_array
    from pyspark_etl_twitter_spark.operators.textstats import ws_tokens

    n = rng.randint(2, 5)
    pdf = pd.DataFrame(
        {"doc_id": range(n_docs), "text": [_rand_doc(rng) for _ in range(n_docs)]}
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "doc_id", F.explode(shingle_array(ws_tokens("text"), n)).alias("g")
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    con.register("fuzz_ngram_docs", pdf)
    want = con.execute(f"""
        WITH tokd AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
          FROM fuzz_ngram_docs
        ),
        grams AS (
          SELECT doc_id, unnest(list_transform(
                     range(1, greatest(len(t) - {n} + 2, 1)),
                     i -> array_to_string(t[i:i+{n - 1}], ' '))) AS g
          FROM tokd
        )
        SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
    """).fetchall()
    a = sorted((int(r.doc_id), r.g, int(r.c)) for r in got)
    b = sorted((int(d), g, int(c)) for d, g, c in want)
    if a != b:
        extra_s = set(a) - set(b)
        extra_d = set(b) - set(a)
        return False, (
            f"n={n} spark-only={sorted(extra_s)[:5]} duck-only={sorted(extra_d)[:5]}"
        )
    return True, ""


def _split_fuzz_batch(rng, spark, con, n_ids=500):
    """Hash-split parity batch: random (possibly huge/negative) ids and a
    random seed through the engine's ``hash_split`` vs the DuckDB
    hex-prefix CASE formula — the md5-bucket assignment must agree on
    every id or incremental ingestion would leak across splits."""
    import pandas as pd

    from pyspark_etl_twitter_spark.operators.curation import hash_split

    seed = f"fuzz-{rng.randint(0, 10**9)}"
    ids = [rng.randint(-(2**62), 2**62) for _ in range(n_ids)]
    pdf = pd.DataFrame({"doc_id": ids})
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            spark.createDataFrame(pdf), "doc_id", seed=seed
        ).collect()
    }
    con.register("fuzz_split_ids", pdf)
    want = dict(
        con.execute(f"""
        SELECT doc_id,
               CASE WHEN bkt < 98 THEN 'train'
                    WHEN bkt < 99 THEN 'val'
                    ELSE 'test' END
        FROM (SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{seed}'), 1, 8)) AS BIGINT) % 100 AS bkt
              FROM fuzz_split_ids)
    """).fetchall()
    )
    if got != want:
        diff = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
        return False, f"seed={seed} diverged={dict(list(diff.items())[:5])}"
    return True, ""


def _canon(rows, cols):
    """Sort rows by a coarse key, keep raw floats for tolerance compare.

    Floats use a 4dp sort key + isclose equality (see _rows_equal): exact
    canonical hashing is wrong for fuzzing because ``round(avg(x), 6)`` of
    exact-decimal data can land exactly on a .5 boundary (group sizes of
    form 2^a·5^b make the average terminate at 7 digits ending in 5),
    where Spark's decimal-string HALF_UP and DuckDB's binary rounding
    legitimately differ by one ulp of the rounding quantum."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def sort_key(v):
        if v is None:
            return ("null",)
        if isinstance(v, float):
            return ("f", round(v, 4)) if not math.isnan(v) else ("nan",)
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    return sorted(
        (tuple(r[i] for i in order) for r in rows),
        key=lambda t: tuple(sort_key(v) for v in t),
    )


def _row_matches(ra, rb):
    if len(ra) != len(rb):
        return False
    for va, vb in zip(ra, rb):
        if isinstance(va, float) and isinstance(vb, float):
            if math.isnan(va) and math.isnan(vb):
                continue
            if not math.isclose(va, vb, rel_tol=1e-9, abs_tol=2e-6):
                return False
        elif va != vb:
            return False
    return True


def _rows_equal(a, b):
    if len(a) != len(b):
        return False
    if all(_row_matches(ra, rb) for ra, rb in zip(a, b)):
        return True
    # Positional compare after independent sorts can spuriously fail when two
    # within-tolerance floats straddle the 4dp sort-key boundary and order the
    # rows differently. Fall back to greedy tolerance-aware multiset matching
    # (O(n^2), but only on the rare near-boundary cases).
    unused = list(range(len(b)))
    for ra in a:
        for j_pos, j in enumerate(unused):
            if _row_matches(ra, b[j]):
                unused.pop(j_pos)
                break
        else:
            return False
    return True


def main() -> int:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    rng = random.Random(seed)

    spark = get_session(app_name="fuzz_oracle", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    # spill outside the repo: a big oracle join (e.g. the dense sf0.1
    # wedge enumeration) otherwise writes tens of GB under ./.tmp
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    stats: dict[str, dict] = {}
    for t, spec in TABLES.items():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        s: dict = {}
        for c in spec["numeric"]:
            lo, hi = con.execute(f"SELECT min({c}), max({c}) FROM {t}").fetchone()
            s[c] = (float(lo), float(hi))
        for c in spec["string"]:
            s[c] = [r[0] for r in con.execute(f"SELECT DISTINCT {c} FROM {t}").fetchall()]
        stats[t] = s

    failures = 0
    for i in range(n_cases):
        roll = rng.random()
        if roll < 0.20:
            sql = _rand_join_query(rng, stats)
        elif roll < 0.40:
            sql = _rand_window_query(rng, stats)
        elif roll < 0.55:
            sql = _rand_setop_query(rng, stats)
        else:
            table = rng.choice(list(TABLES))
            sql = _rand_query(rng, table, TABLES[table], stats[table])
        try:
            sdf = spark.sql(sql)
            srows, scols = sdf.collect(), sdf.columns
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"CASE {i} ERROR: {exc}\n  {sql}")
            continue
        if not _rows_equal(
            _canon([tuple(r) for r in srows], scols), _canon(drows, dcols)
        ):
            failures += 1
            print(f"CASE {i} MISMATCH ({len(srows)} vs {len(drows)} rows):\n  {sql}")

    n_text = max(2, n_cases // 20)
    text_fail = 0
    for i in range(n_text):
        try:
            ok, detail = _text_fuzz_batch(rng, spark, con)
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"ERROR {exc}"
        if not ok:
            text_fail += 1
            print(f"TEXT BATCH {i} MISMATCH: {detail}")
    failures += text_fail

    ngram_fail = 0
    for i in range(n_text):
        try:
            ok, detail = _ngram_fuzz_batch(rng, spark, con)
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"ERROR {exc}"
        if not ok:
            ngram_fail += 1
            print(f"NGRAM BATCH {i} MISMATCH: {detail}")
    failures += ngram_fail

    split_fail = 0
    for i in range(n_text):
        try:
            ok, detail = _split_fuzz_batch(rng, spark, con)
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"ERROR {exc}"
        if not ok:
            split_fail += 1
            print(f"SPLIT BATCH {i} MISMATCH: {detail}")
    failures += split_fail
    print(
        f"\nfuzz: {n_cases - (failures - text_fail - ngram_fail - split_fail)}/{n_cases} "
        f"SQL matched, {n_text - text_fail}/{n_text} text batches matched, "
        f"{n_text - ngram_fail}/{n_text} ngram batches matched, "
        f"{n_text - split_fail}/{n_text} split batches matched "
        f"(seed={seed}, sf={sf_dir})"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
