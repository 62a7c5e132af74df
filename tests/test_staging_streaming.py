"""Export-side staging writer (hourly + latest) and incremental
streaming behavior (new files picked up across micro-batch runs)."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from ethereum2_etl_airflow_spark.functions.skew import salted_join
from ethereum2_etl_airflow_spark.operators.load import read_latest_snapshot
from ethereum2_etl_airflow_spark.sources.fixtures import gen_beacon_blocks
from ethereum2_etl_airflow_spark.sources.ndjson import (
    read_ndjson, read_partition, stage_export, staging_path,
)
from ethereum2_etl_airflow_spark.sources.schemas import beacon_schema
from ethereum2_etl_airflow_spark.sources.testdata import load_table

GENESIS = 1704067200
SPS = 300


def test_stage_export_daily_layout(spark, tmp_path):
    blocks = gen_beacon_blocks(spark, 2 * 288, genesis=GENESIS, secs_per_slot=SPS)
    root = str(tmp_path)
    base = stage_export(blocks, root, "beacon_blocks", "block_timestamp")
    assert sorted(os.path.basename(d) for d in
                  glob.glob(f"{base}/block_date=*")) == [
        "block_date=2024-01-01", "block_date=2024-01-02"]
    back = read_ndjson(spark, f"{base}/*/*.json",
                       beacon_schema("beacon_blocks"))
    assert back.count() == 2 * 288


def test_stage_export_hourly_layout_and_latest(spark, tmp_path):
    blocks = gen_beacon_blocks(spark, 48, genesis=GENESIS, secs_per_slot=SPS)
    root = str(tmp_path)
    base = stage_export(blocks, root, "beacon_blocks", "block_timestamp",
                        hourly=True, latest_copy=True)
    # 48 slots x 300s = 4 hours of data under one date
    hours = sorted(os.path.basename(d) for d in
                   glob.glob(f"{base}/block_date=2024-01-01/hour=*"))
    assert hours == ["hour=00", "hour=01", "hour=02", "hour=03"]
    one = read_partition(spark, root, "beacon_blocks",
                         beacon_schema("beacon_blocks"),
                         "2024-01-01", hour="01", hourly=True)
    assert one.count() == 12  # one hour of 300 s slots
    latest = read_latest_snapshot(spark, f"{base}_latest")
    assert latest.count() == 48


def test_streaming_picks_up_new_files(spark, tmp_path):
    """Two availableNow runs: the second sees files staged after the
    first — the sensor-less incremental load (SURVEY §2.7 O6)."""
    from ethereum2_etl_airflow_spark.streaming.hourly import (
        hourly_counts_stream, run_available_now,
    )

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    first = ev.where(F.col("event_id") < 500)
    second = ev.where(F.col("event_id") >= 500)
    first.write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = hourly_counts_stream(spark, src, schema, ts_col="ts",
                                  ts_is_nanos=False)
    r1 = run_available_now(stream, spark)
    assert r1.agg(F.sum("n")).first()[0] == 500

    second.write.mode("append").parquet(src)
    r2 = run_available_now(stream, spark)
    assert r2.agg(F.sum("n")).first()[0] == 1000
    # per-hour rows equal the batch aggregate
    batch = (ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
             .agg(F.count("*").alias("n")).count())
    assert r2.count() == batch


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type")
    dim = ev.groupBy("user_id").agg(F.min("event_id").alias("first_event"))
    plain = ev.join(dim, "user_id")
    salted = salted_join(ev, dim, on="user_id", salt=8)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.select(*plain.columns).collect()}
    assert a == b


def test_salted_join_left_preserves_unmatched(spark):
    fact = spark.createDataFrame(
        [(1, "x"), (2, "y"), (99, "orphan")], "k long, v string")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, d string")
    out = salted_join(fact, dim, on="k", how="left", salt=4).collect()
    got = {(r["k"], r["d"]) for r in out}
    assert got == {(1, "a"), (2, "b"), (99, None)}


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from ethereum2_etl_airflow_spark.operators.similarity import (
        ann_ivf_topk, topk_cosine_bruteforce,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {(r["query_id"], r["vec_id"])
             for r in topk_cosine_bruteforce(emb, qids, k=10).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ann_ivf_topk(emb, qids, k=10,
                                    n_lists=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    # probing half the cells on random data should keep decent recall
    assert recall >= 0.5, f"IVF recall {recall:.2f}"
    # and every IVF hit must carry the exact-tier cosine (same kernel)
    assert len(approx) == 50


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions closed by the
    advancing watermark must agree with the batch window semantics."""
    import os

    from ethereum2_etl_airflow_spark.streaming.sessionize import (
        SESSION_SCHEMA, sessionize_batch, sessionize_stream,
    )

    ev = (load_table(spark, "/root/testdata/sf0.001", "events")
          .select("user_id", "ts", "value"))
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    # two files in event-time order so the watermark advances between
    # micro-batches (maxFilesPerTrigger=1) and closes early sessions
    ev.where(F.col("ts") < "2024-01-15").coalesce(1) \
        .write.mode("append").parquet(src)
    ev.where(F.col("ts") >= "2024-01-15").coalesce(1) \
        .write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream_src = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
    sessions = sessionize_stream(stream_src, gap_s=6 * 3600,
                                 watermark="1 hour")
    import uuid

    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (sessions.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["session_start"], r["session_end"],
            r["n_events"], r["value_millis"])
           for r in spark.table(name).collect()}

    expected = {(r["user_id"], r["session_start"], r["session_end"],
                 r["n_events"], r["value_millis"])
                for r in sessionize_batch(ev, gap_s=6 * 3600).collect()}
    # the stream emits only watermark-closed sessions — a nonempty subset
    assert got, "no sessions closed by the stream"
    assert got <= expected, "stream emitted a session batch disagrees with"


def test_session_fn_multi_chunk_unordered_input():
    """The per-group kernel sorts with a numpy argsort over just the
    (ts, millis) columns (round-11): multiple out-of-order Arrow chunks
    must produce the same sessions as one pre-sorted frame."""
    import datetime

    import pandas as pd

    from ethereum2_etl_airflow_spark.streaming.sessionize import _session_fn

    class _State:
        hasTimedOut = False
        exists = False

        def update(self, v):
            self.value = v

        def setTimeoutTimestamp(self, ts):
            pass

        def getCurrentWatermarkMs(self):
            return 0

    def run(chunks):
        fn = _session_fn(gap_s=3600)
        st = _State()
        out = list(fn((7,), iter(chunks), st))
        return out, st.value

    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(seconds=s), m) for s, m in
            [(0, 1), (10, 2), (7200, 4), (7300, 8), (20000, 16)]]

    def chunk(idx):
        return pd.DataFrame({
            "user_id": 7,
            "ts": pd.Series([rows[i][0] for i in idx], dtype="datetime64[us]"),
            "value": 0.0,
            "millis": [rows[i][1] for i in idx]})

    sorted_out, sorted_state = run([chunk([0, 1, 2, 3, 4])])
    # same rows split across two chunks, interleaved out of order
    multi_out, multi_state = run([chunk([4, 1]), chunk([3, 0, 2])])

    assert sorted_state == multi_state
    a = pd.concat(sorted_out).reset_index(drop=True)
    b = pd.concat(multi_out).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # two closed sessions emitted, the open third kept in state
    assert list(a["n_events"]) == [2, 2]
    assert list(a["value_millis"]) == [3, 12]
    assert sorted_state[2:] == (1, 16)


def test_asof_join_semantics(spark):
    from ethereum2_etl_airflow_spark.functions.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 50)], "k long, t long") \
        .select("k", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 60, "z")], "k long, t long, v string") \
        .select("k", F.timestamp_seconds("t").alias("rts"), "v")

    out = {(r["k"], r["ts"].second + r["ts"].minute * 60, r["asof_v"])
           for r in asof_join(left, right, "k", "ts", "rts").collect()}
    # t=10 inclusive -> "a"; t=20 -> "b"; t=5 -> no earlier ref -> NULL;
    # k=2 t=50 -> ref at 60 is later -> NULL
    assert out == {(1, 10, "a"), (1, 20, "b"), (1, 5, None), (2, 50, None)}

    strict = {(r["k"], r["ts"].second + r["ts"].minute * 60, r["asof_v"])
              for r in asof_join(left, right, "k", "ts", "rts",
                                 strict=True).collect()}
    # strict: the simultaneous ref at t=10 is no longer visible
    assert strict == {(1, 10, None), (1, 20, "b"), (1, 5, None), (2, 50, None)}


def test_verify_ansi_cast_mode(spark):
    """P5 bug-for-bug fidelity: under ANSI mode the reference's
    CAST('<msg>' AS BIGINT) trick errors on a violated invariant and the
    message text surfaces."""
    import pytest

    from ethereum2_etl_airflow_spark.operators.load import derive_block_date
    from ethereum2_etl_airflow_spark.operators.verify import run_check
    from ethereum2_etl_airflow_spark.sources.fixtures import gen_beacon_blocks

    gapped = gen_beacon_blocks(spark, 288, genesis=GENESIS, secs_per_slot=SPS,
                               gap_slots={44})
    derive_block_date(gapped, "block_timestamp") \
        .createOrReplaceTempView("beacon_blocks")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception) as ei:
            run_check(spark, "blocks_count", "2024-01-01", ansi_cast=True)
        assert "not equal to last slot" in str(ei.value) \
            or "CAST_INVALID_INPUT" in str(ei.value)
        # and a clean chain passes under the same mode
        ok = gen_beacon_blocks(spark, 288, genesis=GENESIS, secs_per_slot=SPS)
        derive_block_date(ok, "block_timestamp") \
            .createOrReplaceTempView("beacon_blocks")
        run_check(spark, "blocks_count", "2024-01-01", ansi_cast=True)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_asof_join_tied_reference_rows_deterministic(spark):
    """Several reference rows sharing (key, ts): the payload-struct
    tiebreaker must resolve to the lexicographically greatest payload,
    identically on every run/partitioning."""
    from datetime import datetime

    from ethereum2_etl_airflow_spark.functions.asof import asof_join

    t = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, datetime(2024, 1, 1, 12, 30))],
                                 "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t, "a"), (1, t, "c"), (1, t, "b")],
        "k long, rts timestamp, v string")
    outs = set()
    for n in (1, 2, 3, 8):
        out = asof_join(left, right.repartition(n), "k", "ts", "rts")
        outs.add(out.first()["asof_v"])
    assert outs == {"c"}


def test_dedup_stream_watermark_horizon(spark, tmp_path):
    """In-horizon copies are dropped; a copy arriving beyond the
    watermark delay is state-evicted and survives (the documented
    streaming-dedup contract)."""
    import os
    from datetime import datetime, timedelta

    from ethereum2_etl_airflow_spark.streaming.dedup import (
        dedup_stream, run_dedup_available_now,
    )

    src = str(tmp_path / "docs")
    os.makedirs(src)
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    batch1 = spark.createDataFrame(
        [(1, "the same text", t0),
         (2, "the same text  ", t0 + timedelta(minutes=5)),  # in horizon
         (3, "different text", t0 + timedelta(minutes=6))],
        "doc_id long, text string, ts timestamp")
    # the watermark applied to batch N comes from batch N-1's data, and
    # state eviction runs in end-of-batch cleanup — so the late copy must
    # arrive two batches after the event that advances the watermark:
    # batch2 advances it, batch3's cleanup evicts, batch4's copy survives
    batch2 = spark.createDataFrame(
        [(4, "unrelated text", t0 + timedelta(hours=5))],
        "doc_id long, text string, ts timestamp")
    batch3 = spark.createDataFrame(
        [(6, "another unrelated text", t0 + timedelta(hours=5, minutes=2))],
        "doc_id long, text string, ts timestamp")
    batch4 = spark.createDataFrame(
        [(5, "THE SAME TEXT", t0 + timedelta(hours=5, minutes=3))],
        "doc_id long, text string, ts timestamp")
    # stage each batch as its own file with strictly increasing mtime —
    # the file source orders micro-batches by modification time, and
    # uuid part names make write order ≠ listing order otherwise
    import shutil

    for i, b in enumerate([batch1, batch2, batch3, batch4]):
        tmp = str(tmp_path / f"w{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.startswith("part-"))
        dest = os.path.join(src, f"{i}.parquet")
        shutil.copyfile(os.path.join(tmp, part), dest)
        os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (spark.readStream.schema(batch1.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = run_dedup_available_now(
        dedup_stream(stream, watermark="1 hour"), spark)
    rows = out.collect()
    # batch1: one of doc 1/2 survives (same fingerprint) + doc 3;
    # batch2/3: docs 4 and 6 (new fps; wm reaches t0+4h, state evicted);
    # batch4: doc 5 re-surfaces because the fingerprint state expired
    ids = {r["doc_id"] for r in rows}
    assert out.count() == 5
    assert {3, 4, 5, 6} <= ids and len(ids & {1, 2}) == 1
    fps = [r["fp"] for r in rows]
    assert len(fps) == 5 and len(set(fps)) == 4  # doc5 repeats doc1/2's fp


def test_attribution_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream time-bound join over a single micro-batch equals the
    batch join built from the same logical definition."""
    import os

    from ethereum2_etl_airflow_spark.streaming.join import (
        attribution_join, run_append_available_now)

    rows = [
        # user 1: click at t0, purchases at +30m (match) and +90m (no)
        (1, 100, "click", "2024-01-01 10:00:00"),
        (2, 101, "purchase", "2024-01-01 10:30:00"),
        (3, 102, "purchase", "2024-01-01 11:30:00"),
        # user 2: purchase before any click → no match
        (4, 103, "purchase", "2024-01-02 09:00:00"),
        (5, 104, "click", "2024-01-02 10:00:00"),
    ]
    ev = (spark.createDataFrame(
        [(r[1], 1 if r[0] <= 3 else 2, r[2], r[3]) for r in rows],
        "event_id long, user_id long, event_type string, ts_s string")
        .select("event_id", "user_id", "event_type",
                F.to_timestamp("ts_s").cast("timestamp_ntz").alias("ts")))
    clicks = ev.where("event_type = 'click'")
    purchases = ev.where("event_type = 'purchase'")
    batch = attribution_join(clicks, purchases).collect()
    assert {(r["click_id"], r["purchase_id"]) for r in batch} == {(100, 101)}

    src = str(tmp_path / "ev_src")
    os.makedirs(src, exist_ok=True)
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    streamed = run_append_available_now(
        attribution_join(stream.where("event_type='click'"),
                         stream.where("event_type='purchase'")), spark)
    assert ({(r["click_id"], r["purchase_id"]) for r in streamed.collect()}
            == {(100, 101)})


def test_stream_latest_snapshot_upsert(spark, tmp_path):
    """foreachBatch upsert: two micro-batches → snapshot holds the
    per-key newest row across both; snapshot survives the second merge."""
    import os
    import shutil

    from ethereum2_etl_airflow_spark.operators.load import (
        read_latest_snapshot)
    from ethereum2_etl_airflow_spark.streaming.upsert import (
        stream_latest_snapshot)

    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 11, "b")], "user_id long, seq long, v string")
    b2 = spark.createDataFrame(
        [(1, 12, "c"), (3, 9, "d")], "user_id long, seq long, v string")

    src = str(tmp_path / "up_src")
    os.makedirs(src, exist_ok=True)
    for i, b in enumerate([b1, b2]):
        tmp = str(tmp_path / f"w{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.startswith("part-"))
        dest = os.path.join(src, f"{i}.parquet")
        shutil.copyfile(os.path.join(tmp, part), dest)

    snap = str(tmp_path / "snap")
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream_latest_snapshot(
        stream, snap, ["user_id"], ["seq"],
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()

    result = {r["user_id"]: (r["seq"], r["v"])
              for r in read_latest_snapshot(spark, snap).collect()}
    assert result == {1: (12, "c"), 2: (11, "b"), 3: (9, "d")}


def test_hourly_stream_resumes_from_checkpoint(spark, tmp_path):
    """Checkpointed incremental processing: a second availableNow run
    with the same checkpoint only reads files that arrived since the
    first run, and the complete-mode aggregate stays correct."""
    import os
    import shutil

    from ethereum2_etl_airflow_spark.streaming.hourly import (
        hourly_counts_stream)

    def write_file(df, i):
        tmp = str(tmp_path / f"hw{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.startswith("part-"))
        shutil.copyfile(os.path.join(tmp, part),
                        os.path.join(src, f"{i}.parquet"))

    src = str(tmp_path / "hr_src")
    os.makedirs(src, exist_ok=True)
    mk = lambda rows: spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz")
    from datetime import datetime

    b1 = mk([(1, datetime(2024, 1, 1, 10, 5)),
             (2, datetime(2024, 1, 1, 10, 40))])
    b2 = mk([(3, datetime(2024, 1, 1, 11, 10))])
    write_file(b1, 0)

    ckpt = str(tmp_path / "ckpt")
    schema = b1.schema

    def run_once(qname):
        stream = hourly_counts_stream(spark, src, schema)
        q = (stream.writeStream.format("memory").queryName(qname)
             .outputMode("complete")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r["hour_start"]: (r["n"], r["start_block"], r["end_block"])
                for r in spark.table(qname).collect()}

    first = run_once("hr_run1")
    assert list(first.values()) == [(2, 1, 2)]

    write_file(b2, 1)
    second = run_once("hr_run2")
    assert sorted(second.values()) == [(1, 3, 3), (2, 1, 2)]


def test_attribution_outer_withholds_until_watermark(spark, tmp_path):
    """Left-outer emission contract: an unmatched click is WITHHELD
    while the watermark could still admit a match, and emitted
    null-extended once the watermark passes click_ts + within.  Also
    pins state eviction: matched rows emit immediately in both runs."""
    import glob
    import os
    import shutil

    from ethereum2_etl_airflow_spark.streaming.join import (
        attribution_join_outer, run_append_available_now)

    def mk(rows):
        return (spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts_s string")
            .select("event_id", "user_id", "event_type",
                    F.to_timestamp("ts_s").alias("ts")))

    # u1 click unmatched; u2 click matched at +30m
    real = mk([(100, 1, "click", "2024-01-01 10:00:00"),
               (101, 2, "click", "2024-01-01 10:00:00"),
               (200, 2, "purchase", "2024-01-01 10:30:00")])
    # watermark delay 2 h, join bound 1 h: u1 evictable once the
    # max event time passes t0 + 3 h
    near = mk([(-10, -1, "click", "2024-01-01 12:00:00"),
               (-11, -1, "purchase", "2024-01-01 12:00:00")])
    far = mk([(-20, -2, "click", "2024-01-01 16:00:00"),
              (-21, -2, "purchase", "2024-01-01 16:00:00")])

    def run(files, tag):
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src)
        for i, df in enumerate(files):
            tmp = str(tmp_path / f"tmp_{tag}_{i}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            dest = os.path.join(src, f"{i:03d}.parquet")
            shutil.copyfile(glob.glob(f"{tmp}/part-*.parquet")[0], dest)
            os.utime(dest, (1_700_000_000 + i * 10,) * 2)
        stream = (spark.readStream.schema(real.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = run_append_available_now(attribution_join_outer(
            stream.where("event_type='click'"),
            stream.where("event_type='purchase'")), spark)
        return {(r["user_id"], r["click_id"], r["purchase_id"])
                for r in out.collect()}

    # watermark tops out at t0 (12:00 − 2 h): u1 withheld, match emitted
    got = run([real, near], "open")
    assert (2, 101, 200) in got
    assert not any(u == 1 for u, _, _ in got)
    # watermark reaches t0 + 2 h > t0 + 1 h: u1's null row flushes
    got = run([real, near, far], "closed")
    assert (2, 101, 200) in got and (1, 100, None) in got


def test_enrich_with_dim_left_keeps_unmatched(spark):
    from ethereum2_etl_airflow_spark.streaming.enrich import enrich_with_dim

    facts = spark.createDataFrame([(1, 10), (2, 99)], ["fid", "k"])
    dim = spark.createDataFrame([(10, "a")], ["dk", "attr"])
    out = {r["fid"]: r["attr"]
           for r in enrich_with_dim(facts, dim, "k", "dk", ["attr"],
                                    how="left").collect()}
    assert out == {1: "a", 2: None}


def test_sessionize_tws_matches_batch(spark, tmp_path):
    """transformWithStateInPandas sessionization (Spark 4 StatefulProcessor
    API): watermark-closed sessions must agree with the batch semantics.
    The TWS Python runner needs google.protobuf — skip where absent."""
    pytest.importorskip("google.protobuf")
    import os
    import uuid

    from ethereum2_etl_airflow_spark.streaming.sessionize import (
        sessionize_batch, sessionize_stream_tws,
    )

    ev = (load_table(spark, "/root/testdata/sf0.001", "events")
          .select("user_id", "ts", "value"))
    src = str(tmp_path / "tws_src")
    os.makedirs(src)
    ev.where(F.col("ts") < "2024-01-15").coalesce(1) \
        .write.mode("append").parquet(src)
    ev.where(F.col("ts") >= "2024-01-15").coalesce(1) \
        .write.mode("append").parquet(src)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        schema = spark.read.parquet(src).schema
        stream_src = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
        sessions = sessionize_stream_tws(stream_src, gap_s=6 * 3600,
                                         watermark="1 hour")
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = (sessions.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        got = {(r["user_id"], r["session_start"], r["session_end"],
                r["n_events"], r["value_millis"])
               for r in spark.table(name).collect()}
        expected = {(r["user_id"], r["session_start"], r["session_end"],
                     r["n_events"], r["value_millis"])
                    for r in sessionize_batch(ev, gap_s=6 * 3600).collect()}
        assert got, "no sessions closed by the stream"
        assert got <= expected
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_pinned_shuffle_reentrant_and_threadsafe(spark):
    """The shared conf pin (bounded_state / iterative-loop widths) is
    reference-counted: overlapping holders never leave the session
    pinned after the last exit, nested holders keep the outermost pin,
    and an inner exit does not restore early."""
    import threading

    from ethereum2_etl_airflow_spark.functions.layout import pinned_shuffle

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with pinned_shuffle(spark, 3):
        assert spark.conf.get(key) == "3"
        with pinned_shuffle(spark, 5):        # nested: outermost wins
            assert spark.conf.get(key) == "3"
        assert spark.conf.get(key) == "3"     # inner exit didn't restore
    assert spark.conf.get(key) == before

    # concurrent holders: whatever the interleaving, the value during
    # overlap is a pin (some holder's), and after ALL exit it restores
    n_threads, inside = 8, []
    barrier = threading.Barrier(n_threads)

    def worker():
        barrier.wait()
        with pinned_shuffle(spark, 7):
            inside.append(spark.conf.get(key))

    ts = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(v == "7" for v in inside)
    assert spark.conf.get(key) == before

    # adaptive pin restores too
    akey = "spark.sql.adaptive.enabled"
    abefore = spark.conf.get(akey)
    with pinned_shuffle(spark, 2, adaptive=False):
        assert spark.conf.get(akey) == "false"
    assert spark.conf.get(akey) == abefore

    # an inner adaptive=False request under a width-only outer pin is
    # honored and restored when the inner (last adaptive) holder exits
    # — round-6 advice: it used to be silently dropped
    with pinned_shuffle(spark, 3):
        with pinned_shuffle(spark, 5, adaptive=False):
            assert spark.conf.get(akey) == "false"
            assert spark.conf.get(key) == "3"   # width: outermost wins
        assert spark.conf.get(akey) == abefore  # adaptive restored early
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before

    # broadcast-threshold knob (round-7 advice: kcore's naive
    # save/restore raced concurrent holders): first non-None holder
    # saves, last restores; nested raise under a width-only pin works
    tkey = "spark.sql.autoBroadcastJoinThreshold"
    tbefore = spark.conf.get(tkey)
    with pinned_shuffle(spark, 3):
        with pinned_shuffle(spark, 5, broadcast_threshold="128m"):
            assert spark.conf.get(tkey) == "128m"
            with pinned_shuffle(spark, 7, broadcast_threshold="256m"):
                # conflicting nested values: the first holder wins
                assert spark.conf.get(tkey) == "128m"
            assert spark.conf.get(tkey) == "128m"
        assert spark.conf.get(tkey) == tbefore  # restored by last holder
    assert spark.conf.get(tkey) == tbefore

    # concurrent threshold holders restore exactly once
    inside2 = []
    barrier2 = threading.Barrier(n_threads)

    def worker2():
        barrier2.wait()
        with pinned_shuffle(spark, 7, broadcast_threshold="64m"):
            inside2.append(spark.conf.get(tkey))

    ts = [threading.Thread(target=worker2) for _ in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(v == "64m" for v in inside2)
    assert spark.conf.get(tkey) == tbefore


def test_pinned_shuffle_state_is_per_session(spark):
    """Two SparkSessions have independent SQLConf — the pin state must
    be keyed per session (round-6 advice: a module-global refcount
    silently skipped pinning the second session and restored the first
    session's saved conf into it)."""
    from ethereum2_etl_airflow_spark.functions.layout import pinned_shuffle

    key = "spark.sql.shuffle.partitions"
    other = spark.newSession()
    before_a, before_b = spark.conf.get(key), other.conf.get(key)
    with pinned_shuffle(spark, 3):
        with pinned_shuffle(other, 5):
            # each session pinned to ITS OWN value, not the outer's
            assert spark.conf.get(key) == "3"
            assert other.conf.get(key) == "5"
        assert other.conf.get(key) == before_b
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before_a
    assert other.conf.get(key) == before_b


def test_state_partitions_auto_size_tracks_key_volume(spark):
    """The round-9 state-partition sweep measured (docs/SCALE.md): at
    96k active keys the wall falls ~linearly with partitions up to 32;
    at few-thousand-key check streams 4 beats 8.  state_partitions
    encodes that rule — ~3k live keys per partition, floored at the
    small-stream 4, capped at the session parallelism — so the auto
    size must pick the measured sweet spot at both ends and never
    exceed the box."""
    from ethereum2_etl_airflow_spark.streaming import (
        STATE_PARTITIONS, state_partitions)

    par = max(4, spark.sparkContext.defaultParallelism)
    # no estimate / degenerate estimates -> the small-stream floor
    assert state_partitions(None, spark) == STATE_PARTITIONS
    assert state_partitions(0, spark) == STATE_PARTITIONS
    assert state_partitions(-5, spark) == STATE_PARTITIONS
    # sf0.1 check streams (couple thousand keys) -> stay at the floor
    assert state_partitions(2_000, spark) == STATE_PARTITIONS
    # the measured 64x sweep point: 96k keys -> the measured 32-part
    # sweet spot (capped by parallelism on smaller boxes)
    assert state_partitions(96_000, spark) == min(32, par)
    # intermediate volumes interpolate monotonically
    widths = [state_partitions(n, spark)
              for n in (2_000, 12_000, 48_000, 96_000, 10_000_000)]
    assert widths == sorted(widths)
    # never exceeds the session's executor parallelism
    assert state_partitions(10_000_000, spark) <= par
    # without a session to read parallelism from, stays conservative
    assert state_partitions(96_000, None) == STATE_PARTITIONS


def test_run_bounded_flush_false_matches_and_restores_conf(spark, tmp_path):
    """``flush=False`` (skip the final no-data micro-batch) is valid
    for emission-on-arrival append queries: an inner attribution join
    over a MULTI-batch source must emit the identical row set with and
    without the flush batch, and the session conf must be restored
    after the run (including when it was previously set)."""
    import os
    import shutil
    from datetime import datetime, timedelta

    from ethereum2_etl_airflow_spark.streaming import run_bounded
    from ethereum2_etl_airflow_spark.streaming.join import attribution_join

    src = str(tmp_path / "ev")
    os.makedirs(src)
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows1 = [(i, i % 3, "click", t0 + timedelta(minutes=i))
             for i in range(6)]
    rows2 = [(100 + i, i % 3, "purchase", t0 + timedelta(minutes=i + 10))
             for i in range(6)]
    for i, rows in enumerate([rows1, rows2]):
        b = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "ts timestamp")
        tmp = str(tmp_path / f"w{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.startswith("part-"))
        dest = os.path.join(src, f"{i}.parquet")
        shutil.copyfile(os.path.join(tmp, part), dest)
        os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    def run(flush):
        stream = (spark.readStream
                  .schema("event_id long, user_id long, "
                          "event_type string, ts timestamp")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        joined = attribution_join(
            stream.where(F.col("event_type") == "click"),
            stream.where(F.col("event_type") == "purchase"))
        return sorted(map(tuple, run_bounded(
            joined, spark, mode="append", prefix="tf",
            flush=flush).collect()))

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    spark.conf.set(key, "true")
    assert run(flush=False) == run(flush=True)
    assert spark.conf.get(key) == "true"  # restored to the prior value
