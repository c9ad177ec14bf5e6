"""Regression guard for the events.ts layout (VERDICT r2 §wrong #1).

The driver testdata has shipped events.ts as both TIMESTAMP(NANOS)
(bigint via nanosAsLong) and TIMESTAMP(MICROS) (TIMESTAMP_NTZ); round 2's
loader assumed one layout and broke 11 queries + 15 tests. These tests load
events from the REAL testdata dirs — not a fixture — so any future schema
drift fails loudly here first, and they pin the loader contract: whatever
the file stores, downstream always sees a session-TZ ``timestamp`` column.
"""

import datetime
import os

import pytest

from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL, SF_TINY


@pytest.mark.parametrize("sf_dir", [SF_TINY, SF_SMALL])
def test_events_loads_from_real_testdata(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.select("ts").first()
    assert isinstance(row.ts, datetime.datetime)
    assert df.count() > 0


def test_events_legacy_nanos_long_layout_still_converts(spark, tmp_path):
    """A synthetic nanos-as-long layout (round 1's on-disk shape) must take
    the truncate-to-micros branch and land on the identical wall-clock."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    nanos = [1_700_000_000_123_456_789, 1_700_000_060_000_000_001]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(nanos, pa.timestamp("ns")),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(['{"a":1}', "{}"]),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    want = [
        datetime.datetime.fromtimestamp(n // 1000 / 1_000_000, datetime.timezone.utc)
        .replace(tzinfo=None)
        for n in sorted(nanos)
    ]
    assert got == want


def test_events_micros_ntz_layout_passes_through(spark, tmp_path):
    """The current testdata layout (timestamp[us], NTZ in Spark) must cast
    to session-TZ timestamp preserving wall-clock (session TZ is UTC)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_700_000_000_123_456, 1_700_000_060_000_000]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(micros, pa.timestamp("us")),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(['{"a":1}', "{}"]),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    want = [
        datetime.datetime.fromtimestamp(m / 1_000_000, datetime.timezone.utc)
        .replace(tzinfo=None)
        for m in sorted(micros)
    ]
    assert got == want
