"""Local stand-in for the driver's correctness gate — DRIVER-FAITHFUL.

Runs every ``queries()`` entry in Spark and its ``oracle_sql()`` twin in
DuckDB on the same sf dir, then compares row count, column names, and
order-insensitive values (floats to 9 dp — stricter than any plausible
driver hash rounding, since the queries already round on both sides).

Two properties make this match the driver's gate (round-5 verdict #2):

1. Oracle results are fetched through **Arrow/pandas** (``res.df()``), not
   ``fetchall()``. DuckDB renders HUGEINT/DECIMAL as float64 on that path
   (``sum(INTEGER)`` → HUGEINT → ``6277.0``), so an oracle whose type
   differs from Spark's BIGINT now FAILS here exactly as it fails there.
   ``fetchall()`` yields Python ints for HUGEINT and hid the whole class.
2. Every oracle is additionally type-swept via ``DESCRIBE <sql>`` and the
   run FAILS outright if any result column is HUGEINT/UHUGEINT/DECIMAL —
   those types are hash-unsafe on the driver path even when today's values
   happen to compare equal.
3. Complex-typed outputs (array/map/struct on the Spark side, ``T[]`` /
   STRUCT / MAP / LIST on the DuckDB side) hard-FAIL for every
   oracle-backed query (round-7 verdict #2): the driver's pandas
   canonicalizer raises ``unhashable type: 'list'`` on list cells, while
   this gate's ``_canon`` tuples them — without the rejection the gate
   greens exactly what the driver errs on.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark_etl_twitter_spark.session import get_session  # noqa: E402
from pyspark_etl_twitter_spark.sources.catalog import TABLES  # noqa: E402

#: DuckDB result types that the driver's Arrow/pandas hash path renders
#: differently from Spark's integer collect — reject them outright.
_HASH_UNSAFE_TYPES = ("HUGEINT", "DECIMAL")

#: Complex-shaped result types the driver cannot hash AT ALL: its pandas
#: canonicalizer factorizes cell values, and Python lists/dicts are
#: unhashable (r7 driver reds on encoded_docs/embedding_centroids_by_label:
#: ``TypeError: unhashable type: 'list'``). This gate used to tuple-ify
#: lists (see _canon) and silently green what the driver errs on — now any
#: array/struct/map output column is a hard FAIL, same mechanism as the
#: r6 HUGEINT rejection. Serialize arrays in the query (array_join /
#: to_json) on BOTH sides instead.
_COMPLEX_TYPE_MARKERS = ("[]", "STRUCT", "MAP(", "LIST", "UNION(", "JSON")


def _canon(value):
    # numpy scalars (the pandas fetch path) canonicalize like their Python
    # counterparts — but a float64-rendered HUGEINT stays a float and will
    # (correctly) mismatch Spark's int, mirroring the driver's hash.
    try:
        import numpy as np

        if isinstance(value, np.integer):
            value = int(value)
        elif isinstance(value, np.floating):
            value = float(value)
        elif isinstance(value, np.bool_):
            value = bool(value)
        elif isinstance(value, np.ndarray):
            value = value.tolist()
    except ImportError:  # pragma: no cover
        pass
    if value is None or (isinstance(value, float) and math.isnan(value)):
        return ("null",) if value is None else ("nan",)
    # DuckDB's pandas fetch widens DATE to datetime64 (midnight); Spark
    # collects datetime.date. Render both as the date string when the time
    # part is exactly midnight so date-typed columns compare equal — the
    # real driver accepts this pairing (weekly_revenue_wow was green in r4).
    if isinstance(value, _dt.datetime) or type(value).__name__ == "Timestamp":
        if value != value:  # pd.NaT
            return ("null",)
        s = str(value)
        if s.endswith(" 00:00:00"):
            s = s[:-9]
        return ("s", s)
    if isinstance(value, _dt.date):
        return ("s", str(value))
    if isinstance(value, float):
        return ("f", round(value, 9))
    if isinstance(value, bool):
        return ("b", value)
    if isinstance(value, int):
        return ("i", value)
    if isinstance(value, list):
        return ("l", tuple(_canon(v) for v in value))
    return ("s", str(value))


def _rows_canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _oracle_types(con, sql: str) -> dict[str, str]:
    """DuckDB result-column types for an oracle query."""
    return {col: typ for col, typ, *_ in con.execute("DESCRIBE " + sql).fetchall()}


def _unsafe_columns(types: dict[str, str]) -> list[tuple[str, str]]:
    """Result columns whose DuckDB type is hash-unsafe on the driver path:
    HUGEINT/DECIMAL (float64-rendered via Arrow, mismatching Spark ints)
    and ANY complex type (unhashable in the driver's pandas canonicalizer)."""
    return [
        (col, typ)
        for col, typ in types.items()
        if any(t in typ.upper() for t in _HASH_UNSAFE_TYPES + _COMPLEX_TYPE_MARKERS)
    ]


def _spark_complex_columns(schema) -> list[tuple[str, str]]:
    """Spark result columns whose type the driver cannot hash (array /
    map / struct collect to Python lists/dicts/Rows — unhashable in the
    driver's pandas ``factorize``)."""
    from pyspark.sql import types as ST

    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if isinstance(f.dataType, (ST.ArrayType, ST.MapType, ST.StructType))
    ]


_INT_TYPES = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")


def _narrow_nullable_ints(df, types: dict[str, str]):
    """Undo pandas' nullable-int widening: a DECLARED-integer DuckDB column
    (per DESCRIBE — so never HUGEINT, which hard-fails earlier) that holds
    NULLs arrives as float64 with NaN. The real driver hashes this shape
    green (weekly_revenue_wow, nullable BIGINT, r4), so integral floats go
    back to int and NaN to None. Genuine type mismatches (sum→HUGEINT)
    are caught by the type sweep, not here."""
    import numpy as np
    import pandas as pd

    for col, typ in types.items():
        if typ.upper() in _INT_TYPES and col in df.columns and df[col].dtype == np.float64:
            vals = [
                None if v != v else (int(v) if float(v).is_integer() else float(v))
                for v in df[col]
            ]
            # dtype=object, or pandas silently re-coerces the ints to float64
            df[col] = pd.Series(vals, dtype=object, index=df.index)
    return df


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
        complex_cols = _spark_complex_columns(sdf.schema)
        if complex_cols:
            failed.append((name, f"DRIVER-UNHASHABLE SPARK TYPES: {complex_cols}"))
            print(
                f"FAIL  {name}: spark output has complex-typed columns "
                f"{complex_cols} — the driver's canonicalizer cannot hash "
                f"lists; serialize (array_join / to_json) on both sides"
            )
            continue
        try:
            types = _oracle_types(con, oracles[name])
            unsafe = _unsafe_columns(types)
            if unsafe:
                failed.append((name, f"HASH-UNSAFE ORACLE TYPES: {unsafe}"))
                print(
                    f"FAIL  {name}: oracle returns hash-unsafe types {unsafe} "
                    f"— CAST(... AS BIGINT) in the oracle SQL"
                )
                continue
            res = con.execute(oracles[name])
            duck_df = res.df()  # Arrow/pandas path — what the driver hashes
            duck_df = _narrow_nullable_ints(duck_df, types)
            duck_cols = list(duck_df.columns)
            duck_rows = list(duck_df.itertuples(index=False, name=None))
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
