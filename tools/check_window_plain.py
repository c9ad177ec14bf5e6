"""Drive the 50 driver-window queries under a PLAIN SparkSession — the
driver's session shape (default confs, 200 shuffle partitions, no engine
pinning beyond what each query's own pin_oracle_confs sets) — and compare
against the DuckDB oracles with check_oracles' driver-faithful machinery.

Exists because tools/check_oracles.py runs under get_session's engine
confs: a query that silently depended on them would pass there and fail
the real driver. Run this on every window recomposition (r7: 50/50 ok).

Usage: python tools/check_window_plain.py [sf_dir] [n_window]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

from pyspark_etl_twitter_spark.sources.catalog import TABLES
from tools.check_oracles import (
    _narrow_nullable_ints,
    _oracle_types,
    _rows_canon,
    _unsafe_columns,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    window = list(qs)[:n_window]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    rows_only_ok = 0
    for name in window:
        if name not in oracles:
            # r9 window rule: the four rows-only-by-design queries occupy
            # window slots for a crash/row-drift refresh — mirror the
            # driver's weaker check (execute + row count), don't fail.
            try:
                n = qs[name](spark, sf_dir).count()
                print(f"ROWS-ONLY ok {name} ({n} rows)")
                rows_only_ok += 1
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL {name}: rows-only execution raised {exc!r}"[:200])
                bad += 1
            continue
        sdf = qs[name](spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        types = _oracle_types(con, oracles[name])
        unsafe = _unsafe_columns(types)
        if unsafe:
            print(f"FAIL {name}: hash-unsafe oracle types {unsafe}")
            bad += 1
            continue
        duck_df = _narrow_nullable_ints(con.execute(oracles[name]).df(), types)
        dcols = list(duck_df.columns)
        drows = list(duck_df.itertuples(index=False, name=None))
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and _rows_canon([tuple(r) for r in srows], scols)
            == _rows_canon(drows, dcols)
        )
        print(("OK  " if ok else "FAIL"), name, len(srows))
        bad += not ok
    print(
        f"window under PLAIN session: {len(window) - bad - rows_only_ok} ok, "
        f"{bad} failed, {rows_only_ok} rows-only"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
