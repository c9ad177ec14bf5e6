"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry in Spark and its ``oracle_sql()`` twin in
DuckDB on the same sf dir, then compares row count, column names/types, and
order-insensitive values (floats to 9 dp — stricter than any plausible
driver hash rounding, since the queries already round on both sides).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark_etl_twitter_spark.session import get_session  # noqa: E402
from pyspark_etl_twitter_spark.sources.catalog import TABLES  # noqa: E402


def _canon(value):
    if value is None:
        return ("null",)
    if isinstance(value, float):
        if math.isnan(value):
            return ("nan",)
        return ("f", round(value, 9))
    if isinstance(value, int):
        return ("i", value)
    return ("s", str(value))


def _rows_canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    spark = get_session(app_name="check_oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    # spill outside the repo: a big oracle join (e.g. the dense sf0.1
    # wedge enumeration) otherwise writes tens of GB under ./.tmp
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            rows_only.append((name, len(spark_rows)))
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle, by design)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            a = _rows_canon([tuple(r) for r in spark_rows], spark_cols)
            b = _rows_canon(duck_rows, duck_cols)
            if a != b:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                detail = "; ".join(f"row{i}: spark={a[i]} duck={b[i]}" for i in diff)
                problems.append(f"values differ ({detail})")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passed.append(name)
            print(f"OK    {name} ({len(spark_rows)} rows)")

    print(
        f"\n{len(passed)} ok, {len(failed)} failed, {len(rows_only)} rows-only "
        f"(sf_dir={sf_dir})"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
