"""Differential fuzzing: random filter+aggregate queries executed by both
Spark and DuckDB on the same parquet, results compared exactly.

Each case: a random conjunction/disjunction of column predicates over
lineitem or orders + a random group-by + a random set of aggregates,
rendered once as a Spark plan and once as SQL. Catches semantic drift
(null handling, comparison/casting rules, aggregate typing) that curated
queries can sidestep.

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
        if roll < 0.25:
            sql = _rand_join_query(rng, stats)
        elif roll < 0.45:
            sql = _rand_window_query(rng, stats)
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
    print(f"\nfuzz: {n_cases - failures}/{n_cases} matched (seed={seed}, sf={sf_dir})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
