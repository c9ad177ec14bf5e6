"""Parameter-sweep differential check for containment decontamination.

``curation.containment_contamination`` vs a DuckDB replay across shingle
sizes and eval-slice moduli the curated registry row never exercises —
including shingle_n=1 (token-set containment), an n larger than many
docs (empty gram sets on both engines), and eval slices dense enough
that tie-breaks matter (best_eval_id = smallest eval id among max-score
ties, the min_by struct tiebreak). Exact dict equality on
(doc_id) → (max_containment, best_eval_id).

Usage: python tools/fuzz_containment.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_etl_twitter_spark.operators.curation import (  # noqa: E402
    containment_contamination,
)
from pyspark_etl_twitter_spark.session import get_session  # noqa: E402
from pyspark_etl_twitter_spark.sources.catalog import load_table  # noqa: E402

CASES = [(1, 97, 0), (2, 53, 1), (3, 31, 2), (5, 11, 3), (7, 211, 4)]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(
        app_name="fuzz_containment", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    fails = 0
    for n, mod, seed in CASES:
        docs = load_table(spark, sf, "documents")
        ev = docs.filter(F.col("doc_id") % mod == seed)
        tr = docs.filter(F.col("doc_id") % mod != seed)
        got = {
            r.doc_id: (r.max_containment, r.best_eval_id)
            for r in containment_contamination(tr, ev, shingle_n=n).collect()
        }
        q = f"""
WITH tokd AS (
  SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(t)-{n}+2,1)),
             i -> array_to_string(t[i:i+{n - 1}],' ')))) AS g
  FROM tokd
),
eg AS (SELECT doc_id AS eid, g FROM grams WHERE doc_id % {mod} = {seed}),
es AS (SELECT eid, count(*) AS bsz FROM eg GROUP BY eid),
inter AS (
  SELECT gr.doc_id, eg.eid, count(*) AS ninter
  FROM grams gr JOIN eg USING (g)
  WHERE gr.doc_id % {mod} <> {seed}
  GROUP BY 1, 2
),
sc AS (
  SELECT i.doc_id, i.eid,
         round(CAST(ninter AS DOUBLE)/CAST(es.bsz AS DOUBLE), 6) AS c
  FROM inter i JOIN es USING (eid)
)
SELECT doc_id, max(c) AS mc,
       first(eid ORDER BY c DESC, eid ASC) AS best
FROM sc GROUP BY doc_id"""
        exp = {r[0]: (r[1], r[2]) for r in con.execute(q).fetchall()}
        if got != exp:
            fails += 1
            bad = {
                k: (got.get(k), exp.get(k))
                for k in (set(got) | set(exp))
                if got.get(k) != exp.get(k)
            }
            print(
                f"n={n} mod={mod} seed={seed}: MISMATCH ({len(bad)} rows) "
                f"{list(bad.items())[:3]}"
            )
        else:
            print(f"n={n} mod={mod} seed={seed}: OK ({len(got)} scored docs)")
    print(f"FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
