"""Schema-drift guard for the events loader (round-3 regression).

A 100 TB lakehouse ingests across eras: the same logical column ships as
parquet TIMESTAMP(NANOS) in one ingestion era (Spark reads it only as LONG
nanos under ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS)
in another (native ``timestamp_ntz``). ``load_table`` must normalize BOTH
encodings to the identical loaded schema and identical wall-clock values —
hard-coding one encoding is exactly the assumption that died in round 3 when
the fixture generator switched encodings.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_benchmark_java_spark.catalog import load_table

# One known instant, expressed both ways: 2024-03-01 12:34:56.789 UTC.
_MICROS = [1709296496789000, 1709296496789001, 1709382896000000]
_IDS = [1, 2, 3]


def _write_events(dirpath: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array(_IDS, pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"k":1}', "{}", "{}"]),
        }
    )
    path = os.path.join(dirpath, "events.parquet")
    pq.write_table(table, path)
    return dirpath


@pytest.fixture(scope="module")
def drift_dirs(tmp_path_factory):
    nanos_dir = str(tmp_path_factory.mktemp("events_nanos"))
    micros_dir = str(tmp_path_factory.mktemp("events_micros"))
    instant_dir = str(tmp_path_factory.mktemp("events_instant"))
    _write_events(
        nanos_dir,
        pa.array([m * 1000 for m in _MICROS], pa.timestamp("ns")),
    )
    _write_events(micros_dir, pa.array(_MICROS, pa.timestamp("us")))
    _write_events(instant_dir, pa.array(_MICROS, pa.timestamp("us", tz="UTC")))
    return nanos_dir, micros_dir, instant_dir


def test_all_encodings_load_with_identical_schema(spark, drift_dirs):
    dfs = [load_table(spark, d, "events") for d in drift_dirs]
    for df in dfs:
        assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
        assert [f.name for f in df.schema.fields] == [
            f.name for f in dfs[0].schema.fields
        ]


def test_all_encodings_load_identical_values(spark, drift_dirs):
    results = [
        sorted(
            load_table(spark, d, "events").select("event_id", "ts").collect()
        )
        for d in drift_dirs
    ]
    assert results[0] == results[1] == results[2]
    # spot-check the wall-clock value survived every path
    assert results[0][0].ts.isoformat() == "2024-03-01T12:34:56.789000"


def test_live_fixture_loads(spark):
    # the driver-generated fixture, whatever encoding it currently ships
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert df.limit(5).count() >= 0
