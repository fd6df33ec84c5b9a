"""Structured Streaming tests: file source → memory sink, vs batch truth."""

from __future__ import annotations

import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from iceberg_benchmark_java_spark import streaming
from iceberg_benchmark_java_spark.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stream_source_dir(spark, tmp_path_factory):
    """Events split into 3 parquet files → 3 deterministic micro-batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    events = load_table(spark, SF_SMOKE, "events")
    # Range-partition by ts so the 3 files cover disjoint, ascending time
    # ranges: the file stream source processes them in path order, so event
    # time advances monotonically across micro-batches and the watermark
    # never drops in-order data.
    events.withColumn("ts", events.ts.cast("timestamp")).repartitionByRange(
        3, "ts"
    ).sortWithinPartitions("ts").write.mode("overwrite").parquet(d)
    # The file stream source orders micro-batches by file MODIFICATION time
    # (ties broken arbitrarily) — all parts get the same mtime from one
    # write, so stamp increasing mtimes in filename order to make batch
    # order = time order deterministically.
    import os
    import time as _time

    base = _time.time()
    for i, part in enumerate(sorted(Path(d).glob("part-*.parquet"))):
        os.utime(part, (base + i, base + i))
    return d


def _await_done(query, timeout=300):
    # availableNow trigger: the query self-terminates once the source drains.
    assert query.awaitTermination(timeout), "stream did not terminate in time"


def test_hourly_aggregate_stream_matches_batch(spark, stream_source_dir):
    src = streaming.read_events_stream(spark, stream_source_dir)
    agg = streaming.hourly_aggregate_stream(src)
    # complete mode: the memory table is the full final aggregate, so the
    # comparison is insensitive to micro-batch ordering and watermarking.
    q = streaming.run_stream_to_memory(
        agg, "hourly_test", output_mode="complete", available_now=True
    )
    try:
        _await_done(q)
        got = {
            (r.hour, r.event_type): (r.n_events, r.total_value)
            for r in spark.sql(
                "SELECT hour, event_type, n_events, total_value FROM hourly_test"
            ).collect()
        }
    finally:
        q.stop()
    # batch truth: the registered batch-equivalent query
    from iceberg_benchmark_java_spark.queries import all_queries

    batch = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in all_queries()["pipe_events_hourly"](spark, SF_SMOKE).collect()
    }
    # every batch window appears in the stream output with matching final counts
    missing = {k: v for k, v in batch.items() if got.get(k) != v}
    assert not missing, f"{len(missing)} windows disagree, e.g. {list(missing.items())[:2]}"


def test_sessionize_stream_emits_sessions(spark, stream_source_dir):
    src = streaming.read_events_stream(spark, stream_source_dir)
    # close_by_timeout=False: finite drain — see sessionize_stream docstring.
    sess = streaming.sessionize_stream(src, close_by_timeout=False)
    q = streaming.run_stream_to_memory(
        sess, "sessions_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        rows = spark.sql("SELECT * FROM sessions_test").collect()
    finally:
        q.stop()
    assert rows, "sessionizer emitted nothing"
    assert all(r.n_events >= 1 for r in rows)
    # Reconstruct final per-session state: within a session the emitted
    # count only grows (open snapshots then the closing row), so
    # max(n_events) per (user, session) is the final count.
    stream_sessions: dict = {}
    for r in rows:
        k = (r.user_id, r.session_id)
        stream_sessions[k] = max(stream_sessions.get(k, 0), r.n_events)
    # Batch truth: the registered windowed sessionization query must agree
    # on sessions-per-user and events-per-user (batch ids are 1-based).
    from iceberg_benchmark_java_spark.queries import all_queries

    batch = all_queries()["win_sessionize_events"](spark, SF_SMOKE).collect()
    batch_count: dict = {}
    batch_events: dict = {}
    for r in batch:
        batch_count[r.user_id] = max(batch_count.get(r.user_id, 0), r.session_id)
        batch_events[r.user_id] = batch_events.get(r.user_id, 0) + r.n_events
    stream_count: dict = {}
    stream_events: dict = {}
    for (u, sid), n in stream_sessions.items():
        stream_count[u] = max(stream_count.get(u, 0), sid + 1)
        stream_events[u] = stream_events.get(u, 0) + n
    assert stream_count == batch_count
    assert stream_events == batch_events


@pytest.mark.medium
def test_enrich_stream_to_parquet_exactly_once(spark, stream_source_dir, tmp_path):
    """File-sink ingestion: streamed enrichment equals the batch plan, and
    a restart from the same checkpoint adds nothing (exactly-once)."""
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt")
    src = streaming.read_events_stream(spark, stream_source_dir)
    q = streaming.run_stream_to_parquet(streaming.enrich_events_stream(src), out, ckpt)
    _await_done(q)
    got = spark.read.parquet(out)
    batch = streaming.enrich_events_stream(
        spark.read.parquet(stream_source_dir)
    )
    assert got.count() == batch.count()
    a = {(r.event_id, r.value_bucket) for r in got.select("event_id", "value_bucket").collect()}
    b = {(r.event_id, r.value_bucket) for r in batch.select("event_id", "value_bucket").collect()}
    assert a == b
    # partition pruning works on the sink layout
    one_hour = got.select("event_hour").first().event_hour
    pruned = spark.read.parquet(out).filter(F.col("event_hour") == F.lit(one_hour))
    assert 0 < pruned.count() < got.count()
    # restart with the same checkpoint: no new data -> no new rows
    q2 = streaming.run_stream_to_parquet(
        streaming.enrich_events_stream(
            streaming.read_events_stream(spark, stream_source_dir)
        ),
        out,
        ckpt,
    )
    _await_done(q2)
    assert spark.read.parquet(out).count() == batch.count()


def test_stream_static_customer_join(spark, stream_source_dir):
    """Stream-static dim join equals the batch join on the same inputs."""
    customers = load_table(spark, SF_SMOKE, "customer")
    src = streaming.read_events_stream(spark, stream_source_dir)
    q = streaming.run_stream_to_memory(
        streaming.enrich_with_customer_stream(src, customers),
        "enriched_test",
        output_mode="append",
        available_now=True,
    )
    try:
        _await_done(q)
        got = {
            (r.event_id, r.c_mktsegment)
            for r in spark.sql("SELECT event_id, c_mktsegment FROM enriched_test").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.event_id, r.c_mktsegment)
        for r in streaming.enrich_with_customer_stream(
            spark.read.parquet(stream_source_dir), customers
        ).collect()
    }
    assert got == batch and len(got) > 0


def test_stream_stream_join_matches_batch(spark, stream_source_dir):
    """The watermarked stream-stream interval join emits exactly the pairs
    the identical batch join produces (append mode; inner joins emit only
    watermark-confirmed matches, and availableNow drains the source, so
    the final table is the complete join)."""
    src = streaming.read_events_stream(spark, stream_source_dir)
    joined = streaming.click_purchase_join_stream(src, horizon_minutes=60)
    q = streaming.run_stream_to_memory(
        joined, "ss_join_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        got = {
            (r.click_id, r.purchase_id)
            for r in spark.sql("SELECT * FROM ss_join_test").collect()
        }
    finally:
        q.stop()
    e = spark.read.parquet(stream_source_dir)
    c = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    p = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")),
        ).collect()
    }
    assert got == batch


def test_dedup_stream_drops_redelivered_events(spark, tmp_path):
    """An at-least-once source that re-delivers a whole file must yield
    each event_id exactly once downstream of dedup_events_stream."""
    src = str(tmp_path / "dup_source")
    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).limit(200)
    events.coalesce(1).write.mode("overwrite").parquet(src)
    # simulate redelivery: copy the data file under a new name
    import shutil
    from pathlib import Path

    part = next(Path(src).glob("part-*.parquet"))
    shutil.copy(part, Path(src) / ("redelivered-" + part.name))

    stream = streaming.read_events_stream(spark, src)
    deduped = streaming.dedup_events_stream(stream)
    q = streaming.run_stream_to_memory(
        deduped, "dedup_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        rows = spark.sql("SELECT event_id FROM dedup_test").collect()
    finally:
        q.stop()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)), "duplicate event_ids survived dedup"
    assert len(set(ids)) == events.count()


def _write_event_file(spark, source_dir: str, seq: int, rows: list) -> None:
    """Write one micro-batch file (event_id, ts, user_id, event_type, value,
    props) into ``source_dir`` with a strictly increasing mtime so the file
    source processes files in ``seq`` order."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    df = spark.createDataFrame(
        [(i, ts, 1, et, 1.0, None) for (i, ts, et) in rows],
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(Path(tmp).glob("part-*.parquet"))
        dest = Path(source_dir) / f"batch-{seq:03d}.parquet"
        shutil.copy(part, dest)
    base = 1_700_000_000  # fixed epoch; only relative order matters
    os.utime(Path(source_dir) / f"batch-{seq:03d}.parquet", (base + seq, base + seq))


@pytest.mark.medium
def test_hourly_aggregate_stream_late_data_watermark(spark, tmp_path):
    """Late-data contract of hourly_aggregate_stream (2h watermark):
    out-of-order events still above the watermark are aggregated exactly
    like batch; events whose hour fell below the watermark are DROPPED.

    Spark ≥3.4 filters late records with the PREVIOUS micro-batch's
    watermark and evicts state with the current one (the two-watermark
    design that makes chained stateful operators correct), so a straggler
    is reliably dropped once the watermark advanced a full batch before it
    arrives — the timeline below leaves that one-batch gap:
      b0: 00:10, 00:20, 10:00   -> wm after b0 = 08:00
      b1: 11:00 (filler)        -> wm 09:00; b2's filter wm = 08:00
      b2: 09:30 (late, above wm: KEPT), 00:30 (late, below wm: DROPPED)
      b3: 13:00                 -> wm 11:00, finalizes hours 9/10
    Append mode emits only watermark-finalized windows, so the final table
    must show hour 00 with n=2 (not 3), hours 09/10 with 1 each, and no
    hour-11/13 rows (their windows never finalize)."""
    src = str(tmp_path / "late_events")
    import os

    os.makedirs(src)
    d = "2024-01-01"
    _write_event_file(
        spark, src, 0,
        [(1, f"{d} 00:10:00", "x"), (2, f"{d} 00:20:00", "x"),
         (3, f"{d} 10:00:00", "x")],
    )
    _write_event_file(spark, src, 1, [(9, f"{d} 11:00:00", "x")])
    _write_event_file(
        spark, src, 2,
        [(4, f"{d} 09:30:00", "x"), (5, f"{d} 00:30:00", "x")],
    )
    _write_event_file(spark, src, 3, [(6, f"{d} 13:00:00", "x")])

    stream = streaming.read_events_stream(spark, src)
    agg = streaming.hourly_aggregate_stream(stream, watermark="2 hours")
    q = streaming.run_stream_to_memory(
        agg, "late_hourly_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        got = {
            str(r.hour): r.n_events
            for r in spark.sql(
                "SELECT hour, n_events FROM late_hourly_test"
            ).collect()
        }
    finally:
        q.stop()
    assert got == {
        f"{d} 00:00:00": 2,  # the 00:30 straggler was beyond-watermark: dropped
        f"{d} 09:00:00": 1,  # the 09:30 straggler was within-watermark: kept
        f"{d} 10:00:00": 1,
    }
    # within-watermark data equals the batch aggregate over accepted events
    batch = {
        str(r.hour): r.n
        for r in spark.read.parquet(src)
        .filter(F.col("event_id") != 5)  # minus the dropped straggler
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for hour, n in got.items():
        assert batch[hour] == n


@pytest.mark.medium
def test_dedup_stream_late_data_watermark(spark, tmp_path):
    """Late-data contract of dedup_events_stream (2h watermark): a
    re-delivered id still within the watermark is dropped as a duplicate;
    a record whose event time fell below the watermark is dropped as late
    (even though its id was never seen); fresh within-watermark ids pass.
    Every surviving id appears exactly once. Same one-batch filter-watermark
    lag as the hourly test: a filler batch sits between the watermark
    advance and the straggler."""
    src = str(tmp_path / "late_dedup")
    import os

    os.makedirs(src)
    d = "2024-01-01"
    _write_event_file(
        spark, src, 0,
        [(1, f"{d} 00:10:00", "x"), (2, f"{d} 00:20:00", "x"),
         (3, f"{d} 10:00:00", "x")],
    )
    _write_event_file(spark, src, 1, [(9, f"{d} 11:00:00", "x")])
    # b2's filter watermark = 08:00: id3 re-delivery (10:00) = duplicate,
    # dropped; id4 (09:30) = new and above watermark, kept; id5 (00:30) =
    # never seen but below watermark, dropped as late
    _write_event_file(
        spark, src, 2,
        [(3, f"{d} 10:00:00", "x"), (4, f"{d} 09:30:00", "x"),
         (5, f"{d} 00:30:00", "x")],
    )
    stream = streaming.read_events_stream(spark, src)
    deduped = streaming.dedup_events_stream(stream, watermark="2 hours")
    q = streaming.run_stream_to_memory(
        deduped, "late_dedup_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        ids = [
            r.event_id
            for r in spark.sql("SELECT event_id FROM late_dedup_test").collect()
        ]
    finally:
        q.stop()
    assert sorted(ids) == [1, 2, 3, 4, 9], f"got {sorted(ids)}"


@pytest.mark.medium
def test_sessionize_event_time_closes_on_watermark(spark, tmp_path):
    """Event-time sessionizer: sessions close when the WATERMARK passes
    last-event + gap — no wall-clock waiting, deterministic under replay.
    Timeline (30-min gap, 2h watermark):
      b0: u1 at 00:00 and 00:10; u2 at 00:05
      b1: u1 at 02:00  -> inline-closes u1 session 0 (gap exceeded)
      b2: u2 at 06:00  -> inline-closes u2 session 0; wm after b2 = 04:00,
          which passes u1's (02:00 + 30min) timer -> u1 session 1 closes by
          EVENT-TIME timeout in the final no-data batch
    Final: u1 s0 n=2 closed, u1 s1 n=1 closed, u2 s0 n=1 closed,
    u2 s1 n=1 still open (timer 06:30 > wm)."""
    src = str(tmp_path / "et_sessions")
    import os

    os.makedirs(src)
    d = "2024-01-01"

    def wf(seq, rows):  # (event_id, ts, user_id)
        import shutil
        import tempfile
        from pathlib import Path

        df = spark.createDataFrame(
            [(i, ts, u, "x", 1.0, None) for (i, ts, u) in rows],
            "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with tempfile.TemporaryDirectory() as tmp:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(Path(tmp).glob("part-*.parquet"))
            dest = Path(src) / f"batch-{seq:03d}.parquet"
            shutil.copy(part, dest)
        os.utime(
            Path(src) / f"batch-{seq:03d}.parquet",
            (1_700_000_000 + seq, 1_700_000_000 + seq),
        )

    wf(0, [(1, f"{d} 00:00:00", 1), (2, f"{d} 00:10:00", 1),
           (3, f"{d} 00:05:00", 2)])
    wf(1, [(4, f"{d} 02:00:00", 1)])
    wf(2, [(5, f"{d} 06:00:00", 2)])

    stream = streaming.read_events_stream(spark, src)
    sess = streaming.sessionize_stream_event_time(stream, watermark="2 hours")
    q = streaming.run_stream_to_memory(
        sess, "et_sessions_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        rows = spark.sql("SELECT * FROM et_sessions_test").collect()
    finally:
        q.stop()
    # reconstruct final per-session state: counts only grow within a
    # session, closed=1 rows are terminal
    final: dict = {}
    closed: dict = {}
    for r in rows:
        k = (r.user_id, r.session_id)
        final[k] = max(final.get(k, 0), r.n_events)
        closed[k] = closed.get(k, 0) or r.closed
    assert final == {(1, 0): 2, (1, 1): 1, (2, 0): 1, (2, 1): 1}
    assert closed == {(1, 0): 1, (1, 1): 1, (2, 0): 1, (2, 1): 0}


@pytest.mark.medium
def test_sessionize_event_time_matches_batch(spark, stream_source_dir, tmp_path):
    """Event-time sessionizer equals the batch sessionization on real
    fixture events once the watermark passes every session's close timer:
    a far-future sentinel event (dummy user) appended as a final
    micro-batch advances the watermark beyond last+gap for every real
    user, so ALL their sessions close by event-time timeout, and the
    closed session set must reproduce win_sessionize_events exactly."""
    import os
    import shutil
    from pathlib import Path

    src = str(tmp_path / "et_full")
    os.makedirs(src)
    parts = sorted(Path(stream_source_dir).glob("*.parquet"))
    base = 1_700_000_000
    for i, p in enumerate(parts):
        dest = Path(src) / f"batch-{i:03d}.parquet"
        shutil.copy(p, dest)
        os.utime(dest, (base + i, base + i))
    max_ts = spark.read.parquet(stream_source_dir).agg(
        F.max("ts").alias("m")
    ).first().m
    import datetime
    import tempfile

    sentinel_ts = str(
        max_ts
        + datetime.timedelta(seconds=streaming.events.SESSION_GAP_SECONDS + 3 * 3600)
    )
    sentinel = spark.createDataFrame(
        [(10**9, sentinel_ts, -1, "x", 1.0, None)],
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with tempfile.TemporaryDirectory() as tmp:
        sentinel.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(Path(tmp).glob("part-*.parquet"))
        dest = Path(src) / f"batch-{len(parts):03d}.parquet"
        shutil.copy(part, dest)
    os.utime(
        Path(src) / f"batch-{len(parts):03d}.parquet",
        (base + len(parts), base + len(parts)),
    )

    stream = streaming.read_events_stream(spark, src)
    sess = streaming.sessionize_stream_event_time(stream, watermark="2 hours")
    q = streaming.run_stream_to_memory(
        sess, "et_full_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        rows = spark.sql("SELECT * FROM et_full_test").collect()
    finally:
        q.stop()
    # final per-session counts (counts only grow within a session); the
    # sentinel user (-1) is excluded below — its own session stays open
    stream_sessions: dict = {}
    closed: dict = {}
    for r in rows:
        k = (r.user_id, r.session_id)
        stream_sessions[k] = max(stream_sessions.get(k, 0), r.n_events)
        closed[k] = closed.get(k, 0) or r.closed
    from iceberg_benchmark_java_spark.queries import all_queries

    batch = all_queries()["win_sessionize_events"](spark, SF_SMOKE).collect()
    batch_count: dict = {}
    batch_events: dict = {}
    for r in batch:
        batch_count[r.user_id] = max(batch_count.get(r.user_id, 0), r.session_id)
        batch_events[r.user_id] = batch_events.get(r.user_id, 0) + r.n_events
    real_users = set(batch_count)
    # every real user's sessions all CLOSED (timers fired), and counts match
    stream_count: dict = {}
    stream_events: dict = {}
    for (u, sid), n in stream_sessions.items():
        if u not in real_users:
            continue  # the sentinel user's own open session
        assert closed[(u, sid)] == 1, f"session ({u},{sid}) never closed"
        stream_count[u] = max(stream_count.get(u, 0), sid + 1)
        stream_events[u] = stream_events.get(u, 0) + n
    assert stream_count == batch_count
    assert stream_events == batch_events


def test_dedup_against_corpus_stream(spark, tmp_path):
    """Stream-static anti-join dedup: docs whose text already exists in the
    static corpus are dropped; novel docs pass through exactly once."""
    corpus = load_table(spark, SF_SMOKE, "documents")
    known = [r.text for r in corpus.limit(3).collect()]
    incoming = spark.createDataFrame(
        [(1000, known[0]), (1001, "genuinely new document one"),
         (1002, known[1]), (1003, "genuinely new document two"),
         (1004, known[2])],
        "doc_id BIGINT, text STRING",
    )
    src_dir = str(tmp_path / "docs_stream")
    incoming.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING").parquet(src_dir)
    )
    out = streaming.dedup_against_corpus_stream(stream, corpus)
    q = streaming.run_stream_to_memory(
        out, "corpus_dedup_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        got = sorted(
            r.doc_id for r in spark.sql(
                "SELECT doc_id FROM corpus_dedup_test"
            ).collect()
        )
    finally:
        q.stop()
    assert got == [1001, 1003]


@pytest.mark.medium
def test_sessionize_event_time_timeout_then_return(spark, tmp_path):
    """A user who RETURNS after an event-time timeout closed their session
    must continue numbering at session_id+1 — the timeout tombstone keeps
    the counter, so the new session never collides with the already-emitted
    closed (user_id, session_id) rows. Timeline (30-min gap, 2h watermark):
      b0: u1 @ 00:00                      -> opens u1 s0
      b1: u3 @ 03:00                      -> wm after b1 = 01:00 (> 00:30)
      b2: u3 @ 04:00                      -> u1 s0 closes by TIMEOUT here
                                             (no u1 data in this batch);
                                             u3 s0 inline-closes (1h gap)
      b3: u1 @ 05:00                      -> u1 returns: must be s1, not s0
    Final: u1 {s0 closed n=1, s1 open n=1}; u3 {s0 closed n=1, s1 open}."""
    import os
    import shutil
    import tempfile

    src = str(tmp_path / "et_return")
    os.makedirs(src)
    d = "2024-01-01"

    def wf(seq, rows):  # (event_id, ts, user_id)
        df = spark.createDataFrame(
            [(i, ts, u, "x", 1.0, None) for (i, ts, u) in rows],
            "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with tempfile.TemporaryDirectory() as tmp:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(Path(tmp).glob("part-*.parquet"))
            dest = Path(src) / f"batch-{seq:03d}.parquet"
            shutil.copy(part, dest)
        os.utime(
            Path(src) / f"batch-{seq:03d}.parquet",
            (1_700_000_000 + seq, 1_700_000_000 + seq),
        )

    wf(0, [(1, f"{d} 00:00:00", 1)])
    wf(1, [(2, f"{d} 03:00:00", 3)])
    wf(2, [(3, f"{d} 04:00:00", 3)])
    wf(3, [(4, f"{d} 05:00:00", 1)])

    stream = streaming.read_events_stream(spark, src)
    sess = streaming.sessionize_stream_event_time(stream, watermark="2 hours")
    q = streaming.run_stream_to_memory(
        sess, "et_return_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        rows = spark.sql("SELECT * FROM et_return_test").collect()
    finally:
        q.stop()
    final: dict = {}
    closed: dict = {}
    for r in rows:
        k = (r.user_id, r.session_id)
        final[k] = max(final.get(k, 0), r.n_events)
        closed[k] = closed.get(k, 0) or r.closed
    assert final == {(1, 0): 1, (1, 1): 1, (3, 0): 1, (3, 1): 1}, final
    assert closed == {(1, 0): 1, (1, 1): 0, (3, 0): 1, (3, 1): 0}, closed


@pytest.mark.medium
def test_click_purchase_join_late_data(spark, tmp_path):
    """Interval-join late-data contract: an out-of-order purchase that is
    still ABOVE the watermark joins its click exactly as in batch; one that
    has fallen BELOW the watermark is dropped (and its click's join state
    is already evicted — wm passed click_ts + horizon). Timeline
    (60-min horizon, 2h watermark):
      b0: click c1 u1 @ 01:00, purchase p1 u1 @ 01:30  -> pair (1, 101)
          click c2 u2 @ 01:00 (its purchase arrives too late)
      b1: click c3 u3 @ 09:30, purchase u88 @ 10:00    -> wm -> ~07:30
      b2: filler click/purchase @ 10:30 (u77/u88)      -> this batch's
          state cleanup evicts c2's join state (wm passed 01:00 + 60min;
          eviction lags the wm advance by one batch)
      b3: purchase p3 u3 @ 09:45 (out-of-order vs 10:00 but above wm)
                                                       -> pair (3, 103)
          purchase p2 u2 @ 01:20 (far below wm)        -> DROPPED — c2's
          state is gone and the row is beyond the join's state horizon
    """
    import os
    import shutil
    import tempfile

    src = str(tmp_path / "sj_late")
    os.makedirs(src)
    d = "2024-01-01"

    def wf(seq, rows):  # (event_id, ts, user_id, event_type)
        df = spark.createDataFrame(
            [(i, ts, u, et, 1.0, None) for (i, ts, u, et) in rows],
            "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with tempfile.TemporaryDirectory() as tmp:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.copy(part, Path(src) / f"batch-{seq:03d}.parquet")
        os.utime(
            Path(src) / f"batch-{seq:03d}.parquet",
            (1_700_000_000 + seq, 1_700_000_000 + seq),
        )

    wf(0, [(1, f"{d} 01:00:00", 1, "click"),
           (101, f"{d} 01:30:00", 1, "purchase"),
           (2, f"{d} 01:00:00", 2, "click")])
    wf(1, [(3, f"{d} 09:30:00", 3, "click"),
           (888, f"{d} 10:00:00", 88, "purchase")])
    wf(2, [(77, f"{d} 10:30:00", 77, "click"),
           (889, f"{d} 10:30:00", 88, "purchase")])
    wf(3, [(103, f"{d} 09:45:00", 3, "purchase"),
           (102, f"{d} 01:20:00", 2, "purchase")])

    stream = streaming.read_events_stream(spark, src)
    joined = streaming.click_purchase_join_stream(
        stream, watermark="2 hours", horizon_minutes=60
    )
    q = streaming.run_stream_to_memory(
        joined, "sj_late_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        pairs = sorted(
            (r.click_id, r.purchase_id)
            for r in spark.sql(
                "SELECT click_id, purchase_id FROM sj_late_test"
            ).collect()
        )
    finally:
        q.stop()
    assert pairs == [(1, 101), (3, 103)], pairs


@pytest.mark.medium
def test_sessionize_buffered_handles_cross_batch_disorder(spark, tmp_path):
    """The buffer-until-watermark sessionizer must produce batch-identical
    sessions when a user's events arrive OUT OF ORDER ACROSS micro-batches
    (above-watermark late data) — the delivery the lean event-time variant
    documents as out of contract. Timeline (gap 30 min, watermark 2h):
      b0: u1 @ 00:00 and @ 02:00; u2 @ 00:00
      b1: u1 @ 00:10  <- belongs to u1's FIRST session but arrives after
          02:00 was seen (filter wm = 00:00, so it is legal late data);
          u1 @ 02:10; u2 @ 00:05 and @ 03:00
      b2: far-future sentinel advances the watermark past every close timer
    Correct sessions: u1 {00:00,00:10} then {02:00,02:10}; u2 {00:00,00:05}
    then {03:00}. An order-assuming kernel would instead append 00:10 to
    u1's second session (negative gap) and report (1, 3)."""
    import os

    src = str(tmp_path / "buf_sessions")
    os.makedirs(src)
    d = "2024-01-01"

    def wf(seq, rows):  # (event_id, ts, user_id)
        import shutil
        import tempfile

        df = spark.createDataFrame(
            [(i, ts, u, "x", 1.0, None) for (i, ts, u) in rows],
            "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with tempfile.TemporaryDirectory() as tmp:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.copy(part, Path(src) / f"batch-{seq:03d}.parquet")
        os.utime(
            Path(src) / f"batch-{seq:03d}.parquet",
            (1_700_000_000 + seq, 1_700_000_000 + seq),
        )

    wf(0, [(1, f"{d} 00:00:00", 1), (2, f"{d} 02:00:00", 1),
           (10, f"{d} 00:00:00", 2)])
    wf(1, [(3, f"{d} 00:10:00", 1), (4, f"{d} 02:10:00", 1),
           (11, f"{d} 00:05:00", 2), (12, f"{d} 03:00:00", 2)])
    wf(2, [(999, f"{d} 23:00:00", -1)])  # sentinel: wm -> 21:00

    stream = streaming.read_events_stream(spark, src)
    sess = streaming.sessionize_stream_buffered(stream, watermark="2 hours")
    q = streaming.run_stream_to_memory(
        sess, "buf_sessions_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        rows = spark.sql("SELECT * FROM buf_sessions_test").collect()
    finally:
        q.stop()
    got = {
        (r.user_id, r.session_id): r.n_events for r in rows if r.user_id > 0
    }
    assert all(r.closed == 1 for r in rows)  # kernel emits only finals
    assert got == {(1, 0): 2, (1, 1): 2, (2, 0): 2, (2, 1): 1}, got


@pytest.mark.medium
def test_click_purchase_left_outer_emits_unconverted(spark, tmp_path):
    """Left-outer interval join: a click with no purchase in its horizon is
    emitted exactly once with null purchase columns, but only after the
    watermark passes click_ts + horizon (before that, 'never converted'
    isn't final). Matched clicks behave as in the inner join.
      b0: click c1 u1 @01:00 + purchase p1 u1 @01:30 (converts);
          click c2 u2 @01:00 (never converts)
      b1: purchase filler u9 @10:00  -> wm 08:00 passes c2's horizon
      b2: purchase filler u8 @23:00  -> final wm 21:00 flushes state"""
    import os

    src = str(tmp_path / "lo_join")
    os.makedirs(src)
    d = "2024-01-01"

    def wf(seq, rows):  # (event_id, ts, user_id, event_type)
        import shutil
        import tempfile

        df = spark.createDataFrame(
            [(i, ts, u, et, 1.0, None) for (i, ts, u, et) in rows],
            "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with tempfile.TemporaryDirectory() as tmp:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.copy(part, Path(src) / f"batch-{seq:03d}.parquet")
        os.utime(
            Path(src) / f"batch-{seq:03d}.parquet",
            (1_700_000_000 + seq, 1_700_000_000 + seq),
        )

    wf(0, [(1, f"{d} 01:00:00", 1, "click"),
           (101, f"{d} 01:30:00", 1, "purchase"),
           (2, f"{d} 01:00:00", 2, "click")])
    wf(1, [(901, f"{d} 10:00:00", 9, "purchase")])
    wf(2, [(902, f"{d} 23:00:00", 8, "purchase")])
    # outer-join null emission happens during a LATER batch's state
    # cleanup, so give the eviction one more data batch to run in
    wf(3, [(903, f"{d} 23:30:00", 8, "purchase")])

    stream = streaming.read_events_stream(spark, src)
    joined = streaming.click_purchase_join_stream(
        stream, watermark="2 hours", horizon_minutes=60, join_type="left_outer"
    )
    q = streaming.run_stream_to_memory(
        joined, "lo_join_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        rows = spark.sql(
            "SELECT click_id, purchase_id FROM lo_join_test"
        ).collect()
    finally:
        q.stop()
    got = sorted((r.click_id, r.purchase_id) for r in rows)
    assert got == [(1, 101), (2, None)], got


def test_sliding_aggregate_stream_matches_batch(spark, stream_source_dir):
    """sliding_aggregate_stream (1h/15min hopping windows) in complete mode
    must equal the registered batch twin pipe_events_sliding exactly."""
    src = streaming.read_events_stream(spark, stream_source_dir)
    agg = streaming.sliding_aggregate_stream(src)
    q = streaming.run_stream_to_memory(
        agg, "sliding_test", output_mode="complete", available_now=True
    )
    try:
        _await_done(q)
        got = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.sql(
                "SELECT window_start, event_type, n_events, total_value"
                " FROM sliding_test"
            ).collect()
        }
    finally:
        q.stop()
    from iceberg_benchmark_java_spark.queries import all_queries

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in all_queries()["pipe_events_sliding"](spark, SF_SMOKE).collect()
    }
    missing = {k: v for k, v in batch.items() if got.get(k) != v}
    assert not missing, f"{len(missing)} windows disagree, e.g. {list(missing.items())[:2]}"


@pytest.mark.medium
def test_sliding_aggregate_stream_late_data_watermark(spark, tmp_path):
    """Late-data contract of the hopping-window stream (2h watermark), same
    one-batch filter-watermark-lag timeline as the hourly test: the 00:30
    straggler below the watermark is dropped from ALL 4 of its overlapping
    windows; the 09:30 straggler above it is kept in all 4. Every emitted
    window must equal the batch hopping-window expansion over the accepted
    events, and no window of the unfinalized 13:00 tail may appear."""
    src = str(tmp_path / "late_sliding_events")
    import os

    os.makedirs(src)
    d = "2024-01-01"
    _write_event_file(
        spark, src, 0,
        [(1, f"{d} 00:10:00", "x"), (2, f"{d} 00:20:00", "x"),
         (3, f"{d} 10:00:00", "x")],
    )
    _write_event_file(spark, src, 1, [(9, f"{d} 11:00:00", "x")])
    _write_event_file(
        spark, src, 2,
        [(4, f"{d} 09:30:00", "x"), (5, f"{d} 00:30:00", "x")],
    )
    _write_event_file(spark, src, 3, [(6, f"{d} 13:00:00", "x")])

    stream = streaming.read_events_stream(spark, src)
    agg = streaming.sliding_aggregate_stream(stream, watermark="2 hours")
    q = streaming.run_stream_to_memory(
        agg, "late_sliding_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        got = {
            str(r.window_start): r.n_events
            for r in spark.sql(
                "SELECT window_start, n_events FROM late_sliding_test"
            ).collect()
        }
    finally:
        q.stop()
    assert got, "no windows finalized"
    # batch truth: hopping-window expansion over the ACCEPTED events
    batch = {
        str(r.win.start): r.n
        for r in spark.read.parquet(src)
        .filter(F.col("event_id") != 5)  # minus the dropped straggler
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for w, n in got.items():
        assert batch[w] == n, (w, n, batch.get(w))
    # the 00:30 drop is visible: its containing hour window holds only 00:10+00:20
    assert got[f"{d} 00:00:00"] == 2
    # the kept 09:30 straggler overlaps 10:00 in the [09:30, 10:30) window
    assert got[f"{d} 09:30:00"] == 2
    # 13:00's windows never finalized (watermark stopped at 11:00)
    assert all(w < f"{d} 12:00:00" for w in got)


@pytest.mark.medium
def test_interval_join_late_data_watermark(spark, tmp_path):
    """Late-data contract of click_purchase_join_stream (2h watermark,
    60min horizon): out-of-order click/purchase pairs still above the
    filter watermark are joined exactly like batch; a purchase whose
    event time fell below the watermark is dropped — its would-be pair
    never appears. Same one-batch filter-watermark lag layout as the
    hourly/dedup late tests:
      b0: click 101 @00:10, purchase 201 @00:30 (pair), click 102 @10:00
          -> wm 08:00
      b1: filler 301 @11:00 (event_type x: invisible to the join, only
          advances the watermark) -> wm 09:00; b2's filter wm = 08:00
      b2: click 103 @09:00 + purchase 202 @09:30 (late, above wm: pair
          KEPT), purchase 203 @00:45 (late, below wm: DROPPED — would
          have matched click 101)
      b3: filler 302 @13:00 -> finalize
    Expected pairs: exactly {(101, 201), (103, 202)}; and the stream
    equals the batch join over the events minus the dropped straggler."""
    import os

    src = str(tmp_path / "late_ssjoin")
    os.makedirs(src)
    d = "2024-01-01"
    _write_event_file(
        spark, src, 0,
        [(101, f"{d} 00:10:00", "click"), (201, f"{d} 00:30:00", "purchase"),
         (102, f"{d} 10:00:00", "click")],
    )
    _write_event_file(spark, src, 1, [(301, f"{d} 11:00:00", "x")])
    _write_event_file(
        spark, src, 2,
        [(103, f"{d} 09:00:00", "click"), (202, f"{d} 09:30:00", "purchase"),
         (203, f"{d} 00:45:00", "purchase")],
    )
    _write_event_file(spark, src, 3, [(302, f"{d} 13:00:00", "x")])

    stream = streaming.read_events_stream(spark, src)
    joined = streaming.click_purchase_join_stream(
        stream, watermark="2 hours", horizon_minutes=60
    )
    q = streaming.run_stream_to_memory(
        joined, "late_ssjoin_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        got = {
            (r.click_id, r.purchase_id)
            for r in spark.sql(
                "SELECT click_id, purchase_id FROM late_ssjoin_test"
            ).collect()
        }
    finally:
        q.stop()
    assert got == {(101, 201), (103, 202)}
    # within-watermark stream result equals batch over accepted events
    e = spark.read.parquet(src).filter(F.col("event_id") != 203)
    c = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")
            ),
        ).collect()
    }
    assert got == batch


@pytest.mark.medium
def test_session_window_stream_matches_batch(spark, tmp_path):
    """The NATIVE session_window function is one code path for batch and
    stream: streamed in append mode with a 2h watermark plus a far-future
    sentinel event (whose watermark advance finalizes every real
    session), the emitted sessions must equal the batch sessionization of
    the same events exactly — including an out-of-order within-watermark
    event landing in its correct earlier session."""
    import os

    src = str(tmp_path / "session_src")
    os.makedirs(src)
    d = "2024-01-01"
    # user 1: sessions {00:00,00:10,00:25}, {01:20,01:30}, {05:00}
    _write_event_file(
        spark, src, 0,
        [(1, f"{d} 00:00:00", "click"), (2, f"{d} 00:10:00", "click"),
         (3, f"{d} 01:20:00", "click")],
    )
    _write_event_file(
        spark, src, 1,
        [(4, f"{d} 01:30:00", "click"), (5, f"{d} 00:25:00", "click")],
    )
    _write_event_file(spark, src, 2, [(6, f"{d} 05:00:00", "click")])
    _write_event_file(spark, src, 3, [(9, "2024-01-11 00:00:00", "x")])

    stream = streaming.read_events_stream(spark, src)
    sess = streaming.session_window_aggregate(
        stream, gap="30 minutes", watermark="2 hours"
    )
    q = streaming.run_stream_to_memory(
        sess, "native_session_test", output_mode="append", available_now=True
    )
    try:
        _await_done(q)
        got = {
            (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events)
            for r in spark.sql(
                "SELECT * FROM native_session_test"
            ).collect()
        }
    finally:
        q.stop()
    batch = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in streaming.session_window_aggregate(
            spark.read.parquet(src).filter("event_id != 9"),
            gap="30 minutes",
        ).collect()
    }
    assert got == batch
    assert len(batch) == 3
    n_by_start = {k[1]: v[1] for k, v in batch.items()}
    assert n_by_start[f"{d} 00:00:00"] == 3  # 00:25 straggler joined it
    assert n_by_start[f"{d} 01:20:00"] == 2
    assert n_by_start[f"{d} 05:00:00"] == 1
