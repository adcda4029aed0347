"""Sources (CSV repair, JSONL, SQLite, Wikivoyage XML), multimodal
plumbing and the streaming seam."""

from __future__ import annotations

import json
import os
import sqlite3

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kg_etl_spark.operators.multimodal import attach_binary_payload, extract_features
from kg_etl_spark.schemas import REVIEWS, normalize_columns
from kg_etl_spark.sources.csvsrc import read_csv, read_csv_repaired
from kg_etl_spark.sources.jsonl import read_jsonl, write_jsonl, write_partitioned_parquet
from kg_etl_spark.sources.sqlite_src import load_pois, load_reviews_joined
from kg_etl_spark.sources.xml_wikivoyage import load_wikivoyage_listings, parse_page
from kg_etl_spark.streaming.reviews_stream import (
    dedup_reviews,
    read_review_stream,
    windowed_place_counts,
)


def test_read_csv_id_canonicalization(spark, tmp_path):
    p = tmp_path / "l_listings.csv"
    p.write_text("listing_id,name\n123.0,Flat A\n456,Flat B\n")
    df = read_csv(spark, str(p), id_cols=("listing_id",), required=("listing_id", "name"))
    assert {r["listing_id"] for r in df.collect()} == {"123", "456"}


def test_read_csv_repaired(spark, tmp_path):
    p = tmp_path / "broken.csv"
    p.write_text('id,txt\r\n1,"hello" ,\r\n'.replace('" ,', '" ,'))
    schema = T.StructType([T.StructField("id", T.StringType()), T.StructField("txt", T.StringType())])
    df = read_csv_repaired(spark, str(p), schema)
    rows = df.collect()
    assert rows[0]["id"] == "1"


def test_jsonl_roundtrip_and_partitioned_parquet(spark, tmp_path):
    df = spark.createDataFrame(
        [("r1", "yelp", "p1", 4.0, "good", "2024-01-01", "alpha")], REVIEWS
    )
    out = str(tmp_path / "reviews_jsonl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, REVIEWS)
    assert back.count() == 1
    pq = str(tmp_path / "reviews_pq")
    write_partitioned_parquet(df, pq)
    write_partitioned_parquet(df.withColumn("review_id", F.lit("r2")), pq, mode="append")
    assert spark.read.parquet(pq).count() == 2
    assert os.path.isdir(os.path.join(pq, "city_slug=alpha"))


def test_normalize_columns_aliases(spark):
    raw = spark.createDataFrame(
        [("r1", "yelp", "p1", "4.5", "ok", "2024", "Alpha", "ignored")],
        "review_id string, source string, placeid string, rating string, text string, scraped_at string, city string, junk string",
    )
    norm = normalize_columns(raw, REVIEWS)
    r = norm.collect()[0]
    assert r["place_id"] == "p1" and r["city_slug"] == "Alpha" and r["rating"] == 4.5


def test_sqlite_sources(spark, tmp_path):
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE biz (business_id TEXT, name TEXT, latitude REAL, longitude REAL)")
        c.execute("INSERT INTO biz VALUES ('b1','Cafe',50.0,8.0), ('b2','NoCoords',NULL,NULL)")
        c.execute("CREATE TABLE rev (business_id TEXT, rating REAL, review_text TEXT)")
        c.execute("INSERT INTO rev VALUES ('b1', 5.0, 'great'), ('b1', 'bad', 'junk rating')")
    pois = load_pois(spark, db, "biz", "business_id", "yelp", "name")
    rows = pois.collect()
    assert len(rows) == 1 and rows[0]["place_id"] == "yelp:b1"  # NULL-pruned
    joined = load_reviews_joined(spark, db, "rev", "biz", "business_id", "yelp")
    got = {r["text"]: r["rating"] for r in joined.collect()}
    assert got["great"] == 5.0 and got["junk rating"] is None  # try_cast


WIKI_XML = """<mediawiki>
<page><title>Alpha</title><ns>0</ns><revision><text>
{{see|name=Old Tower|lat=50.1|long=8.1|content=A tower.}}
{{eat|name=Best Cafe|lat=48.2°N|long=8.2|address=Main St 1}}
{{infobox|name=Not a listing}}
</text></revision></page>
<page><title>Redirected</title><ns>0</ns><redirect title="Alpha"/><revision><text>
{{see|name=Should Skip|lat=1|long=2}}
</text></revision></page>
<page><title>Talk:Alpha</title><ns>1</ns><revision><text>
{{see|name=Wrong NS|lat=1|long=2}}
</text></revision></page>
</mediawiki>"""


def test_parse_page_unit():
    rows = parse_page(WIKI_XML.split("</page>")[0] + "</page>")
    assert [r["name"] for r in rows] == ["Old Tower", "Best Cafe"]
    assert rows[1]["lat"] == 48.2  # messy float
    assert rows[1]["address"] == "Main St 1"


def test_load_wikivoyage_listings(spark, tmp_path):
    p = tmp_path / "dump.xml"
    p.write_text(WIKI_XML)
    df = load_wikivoyage_listings(spark, str(p))
    rows = df.collect()
    assert {r["name"] for r in rows} == {"Old Tower", "Best Cafe"}  # ns/redirect filtered
    assert all(r["page_title"] == "Alpha" for r in rows)


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame([(1, "hello"), (2, "world")], "doc_id long, text string")
    media = attach_binary_payload(docs, "text", "doc_id")
    feats = extract_features(media, fake=True, dim=4).collect()
    assert len(feats) == 2
    by = {r["media_id"]: r for r in feats}
    assert by["1"]["n_bytes"] == 5 and len(by["1"]["feature"]) == 4
    # deterministic
    feats2 = extract_features(media, fake=True, dim=4).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    try:
        extract_features(media, fake=False)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_multimodal_resize_and_frames(spark):
    from kg_etl_spark.operators.multimodal import resize_images, sample_frames

    docs = spark.createDataFrame(
        [(1, "hello world this is a longer payload"), (2, "tiny")],
        "doc_id long, text string",
    )
    media = attach_binary_payload(docs, "text", "doc_id")

    resized = {r["media_id"]: r for r in resize_images(media, 16, 16, fake=True).collect()}
    n_out = 16 * 16 // 64
    assert all(len(r["payload"]) == n_out for r in resized.values())
    assert resized["1"]["meta"]["width"] == "16" and resized["1"]["meta"]["height"] == "16"
    # deterministic
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 16, 16, fake=True).collect()}
    assert {k: bytes(v["payload"]) for k, v in resized.items()} == again

    frames = sample_frames(media, every_n=2, fake=True).collect()
    assert len(frames) >= 2
    assert all(r["frame_idx"] % 2 == 0 for r in frames)
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(by_media) == {"1", "2"}  # one-to-many per input row

    for fn in (lambda: resize_images(media, 8, 8), lambda: sample_frames(media)):
        try:
            fn()
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError:
            pass


def test_streaming_dedup_windowed(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    rows = [
        {"review_id": "r1", "place_id": "p1", "rating": 4.0, "text": "a",
         "event_time": "2024-01-01T00:01:00.000Z"},
        {"review_id": "r1", "place_id": "p1", "rating": 4.0, "text": "a",
         "event_time": "2024-01-01T00:01:00.000Z"},  # dup
        {"review_id": "r1", "place_id": "p1", "rating": 4.0, "text": "a",
         "event_time": "2024-01-01T00:02:00.000Z"},  # same review, later ts → still dup
        {"review_id": "r2", "place_id": "p1", "rating": 2.0, "text": "b",
         "event_time": "2024-01-01T00:03:00.000Z"},
    ]
    (src / "part1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = read_review_stream(spark, str(src))
    out = windowed_place_counts(dedup_reviews(stream))
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM win_counts").collect()
    assert len(got) == 1
    assert got[0]["n_reviews"] == 2 and abs(got[0]["avg_rating"] - 3.0) < 1e-9


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    # batch/stream parity: the same expression tree over the same rows
    # must produce identical aggregates in both execution modes.
    from kg_etl_spark.streaming.stateful import read_event_stream, windowed_event_agg

    src = tmp_path / "ev_in"
    src.mkdir()
    rows = [
        {"event_id": 1, "user_id": 1, "event_type": "click", "value": 1.5,
         "ts": "2024-01-01T00:10:00.000Z"},
        {"event_id": 2, "user_id": 2, "event_type": "click", "value": 2.5,
         "ts": "2024-01-01T00:50:00.000Z"},
        {"event_id": 3, "user_id": 1, "event_type": "view", "value": 7.0,
         "ts": "2024-01-01T01:10:00.000Z"},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))

    q = (
        windowed_event_agg(read_event_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("hourly_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["hour_us"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in spark.sql("SELECT * FROM hourly_stream").collect()}

    batch_df = spark.read.schema(
        "event_id long, user_id long, event_type string, value double, ts timestamp"
    ).json(str(src))
    want = {(r["hour_us"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in windowed_event_agg(batch_df).collect()}
    assert got == want
    assert got[(1704067200000000, "click")] == (2, 4.0)


def test_stateful_sessionize_across_batches(spark, tmp_path):
    from kg_etl_spark.streaming.stateful import read_event_stream, sessionize_stateful

    src = tmp_path / "events_in"
    src.mkdir()
    b1 = [
        {"event_id": 1, "user_id": 10, "event_type": "click", "value": 1.0,
         "ts": "2024-01-01T00:00:00.000Z"},
        {"event_id": 2, "user_id": 10, "event_type": "click", "value": 2.0,
         "ts": "2024-01-01T00:00:10.000Z"},
        {"event_id": 3, "user_id": 20, "event_type": "view", "value": 5.0,
         "ts": "2024-01-01T00:00:20.000Z"},
    ]
    b2 = [
        {"event_id": 4, "user_id": 10, "event_type": "buy", "value": 4.0,
         "ts": "2024-01-01T00:01:00.000Z"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))

    out = sessionize_stateful(read_event_stream(spark, str(src)))
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    # last open-session row per user carries the accumulated state
    final = {}
    for r in rows:
        if not r["closed"]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[10] == (3, 7.0)
    assert final[20] == (1, 5.0)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from kg_etl_spark.streaming.joins import (
        CLICK_SCHEMA,
        IMPRESSION_SCHEMA,
        attribute_clicks,
        read_click_stream,
        read_impression_stream,
    )

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(); clk_dir.mkdir()
    imps = [
        {"imp_id": 1, "user_id": 7, "campaign": "a", "imp_time": "2024-01-01T00:00:00.000Z"},
        {"imp_id": 2, "user_id": 7, "campaign": "b", "imp_time": "2024-01-01T01:00:00.000Z"},
        {"imp_id": 3, "user_id": 9, "campaign": "a", "imp_time": "2024-01-01T00:00:00.000Z"},
    ]
    clks = [
        {"click_id": 10, "user_id": 7, "click_time": "2024-01-01T00:10:00.000Z"},  # -> imp 1
        {"click_id": 11, "user_id": 7, "click_time": "2024-01-01T01:29:00.000Z"},  # -> imp 2
        {"click_id": 12, "user_id": 9, "click_time": "2024-01-01T02:00:00.000Z"},  # too late
        {"click_id": 13, "user_id": 8, "click_time": "2024-01-01T00:05:00.000Z"},  # no imp
    ]
    (imp_dir / "i.json").write_text("\n".join(json.dumps(r) for r in imps))
    (clk_dir / "c.json").write_text("\n".join(json.dumps(r) for r in clks))

    out = attribute_clicks(
        read_impression_stream(spark, str(imp_dir)), read_click_stream(spark, str(clk_dir))
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["imp_id"], r["click_id"]): r["delay_s"]
           for r in spark.sql("SELECT * FROM attrib").collect()}
    assert got == {(1, 10): 600, (2, 11): 1740}

    batch = attribute_clicks(
        spark.read.schema(IMPRESSION_SCHEMA).json(str(imp_dir)),
        spark.read.schema(CLICK_SCHEMA).json(str(clk_dir)),
    )
    want = {(r["imp_id"], r["click_id"]): r["delay_s"] for r in batch.collect()}
    assert got == want


def test_streaming_checkpoint_recovery_exactly_once(spark, tmp_path):
    # restartable query: same checkpoint across restarts → batch 1 is
    # not reprocessed when batch 2 arrives (exactly-once file sink)
    src = tmp_path / "ckpt_src"; src.mkdir()
    out = str(tmp_path / "ckpt_out")
    ckpt = str(tmp_path / "ckpt_meta")
    stream = read_review_stream(spark, str(src))

    def run_once():
        q = (
            dedup_reviews(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in [
        {"review_id": "r1", "place_id": "p1", "rating": 4.0, "text": "a",
         "event_time": "2024-01-01T00:01:00.000Z"},
        {"review_id": "r2", "place_id": "p1", "rating": 2.0, "text": "b",
         "event_time": "2024-01-01T00:02:00.000Z"},
    ]))
    run_once()
    (src / "b2.json").write_text(json.dumps(
        {"review_id": "r3", "place_id": "p2", "rating": 5.0, "text": "c",
         "event_time": "2024-01-01T00:03:00.000Z"}))
    run_once()

    got = sorted(r["review_id"] for r in spark.read.parquet(out).collect())
    assert got == ["r1", "r2", "r3"]  # each exactly once across restarts


def test_streaming_scd2_upsert_foreachbatch(spark, tmp_path):
    # lakehouse MERGE pattern: a stream of dimension updates folds into
    # an SCD2 table inside foreachBatch, checkpoint carrying batch ids
    # across restarts
    from kg_etl_spark.operators.scd import scd2_apply, scd2_init

    src = tmp_path / "scd_src"; src.mkdir()
    ckpt = str(tmp_path / "scd_ckpt")
    init = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    state = {"dim": scd2_init(init, "k", ["v"], batch_id=0)}

    def apply_batch(batch_df, bid):
        state["dim"] = scd2_apply(
            state["dim"], batch_df, "k", ["v"], batch_id=int(bid) + 1
        ).localCheckpoint(eager=True)

    def drain():
        q = (
            spark.readStream.schema("k long, v double").json(str(src))
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "b1.json").write_text('{"k": 1, "v": 11.0}\n{"k": 3, "v": 30.0}')
    drain()
    (src / "b2.json").write_text('{"k": 1, "v": 12.0}')
    drain()

    rows = {(r["k"], r["valid_from"], r["valid_to"]): r["v"] for r in state["dim"].collect()}
    assert rows[(1, 0, 1)] == 10.0    # expired by batch 1
    assert rows[(1, 1, 2)] == 11.0    # expired by batch 2
    assert rows[(1, 2, None)] == 12.0 # current
    assert rows[(2, 0, None)] == 20.0 # never touched
    assert rows[(3, 1, None)] == 30.0 # inserted in batch 1


def test_read_resilient_skips_corrupt_file(spark, tmp_path):
    from kg_etl_spark.sources.parquet_dataset import read_resilient

    path = str(tmp_path / "lake")
    spark.range(0, 1000).write.parquet(path)
    # plant a truncated/garbage file among the healthy ones
    with open(f"{path}/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a real parquet file")
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.parquet(path).count()  # strict read dies
    assert read_resilient(spark, path).count() == 1000  # tolerant read completes


def test_streaming_rollup_matches_batch_recompute(spark, tmp_path):
    """Two availableNow drains over a growing file source: the merged
    streaming state must equal a from-scratch batch aggregate, and a
    fresh rerun over batch 1's checkpoint must not double-count."""
    from kg_etl_spark.operators.incremental import finalize_rollup, partial_rollup
    from kg_etl_spark.streaming.rollup_stream import read_rollup_state, rollup_stream

    src = tmp_path / "roll_src"; src.mkdir()
    state = str(tmp_path / "roll_state")
    ckpt = str(tmp_path / "roll_ckpt")

    def rows(lo, hi):
        return "\n".join(
            json.dumps({"k": f"k{i % 3}", "v": float(i)}) for i in range(lo, hi)
        )

    schema = "k string, v double"
    stream = spark.readStream.schema(schema).json(str(src))

    def drain():
        q = rollup_stream(stream, ["k"], "v", state, ckpt, keep_versions=1)
        q.awaitTermination(120)

    (src / "b1.json").write_text(rows(0, 50))
    drain()
    (src / "b2.json").write_text(rows(50, 80))
    drain()
    # no new files: draining again must not change the state
    drain()

    got = sorted(
        tuple(r)
        for r in finalize_rollup(read_rollup_state(spark, state)).collect()
    )
    want = sorted(
        tuple(r)
        for r in finalize_rollup(
            partial_rollup(spark.read.schema(schema).json(str(src)), ["k"], "v")
        ).collect()
    )
    assert got == want

    # superseded versions are pruned: at most current + merge parent remain
    import os

    vdirs = [d for d in os.listdir(state) if d.startswith("v=")]
    assert len(vdirs) <= 2, vdirs

    # restarting with a FRESH checkpoint against the existing state_root
    # must refuse (batch ids reset to 0 would silently fork state)
    (src / "b3.json").write_text(rows(80, 90))
    q = rollup_stream(stream, ["k"], "v", state, str(tmp_path / "fresh_ckpt"))
    with pytest.raises(Exception, match="checkpoint"):
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
    # state is unchanged after the refused write
    got2 = sorted(
        tuple(r)
        for r in finalize_rollup(read_rollup_state(spark, state)).collect()
    )
    assert got2 == got


def test_rollup_upsert_replay_is_exactly_once(spark, tmp_path):
    """Drive the foreachBatch body directly through crash/replay
    sequences the harness can't easily simulate end-to-end:
    re-running a batch id (crash between state commit and checkpoint
    commit) must merge against the SAME parent — never double-count —
    and a skipped-ahead state (version above the incoming batch) must
    be refused."""
    from kg_etl_spark.operators.incremental import finalize_rollup
    from kg_etl_spark.streaming.rollup_stream import (
        read_rollup_state,
        upsert_rollup_batch,
    )

    state = str(tmp_path / "replay_state")
    ck = "ckpt-A"

    def batch(rows):
        return spark.createDataFrame(rows, "k string, v double")

    def totals():
        return {
            r["k"]: r["sum_v"]
            for r in finalize_rollup(read_rollup_state(spark, state)).collect()
        }

    b0 = [("a", 1.0), ("b", 2.0)]
    b1 = [("a", 10.0)]
    upsert_rollup_batch(spark, batch(b0), 0, ["k"], "v", state, ck)
    upsert_rollup_batch(spark, batch(b1), 1, ["k"], "v", state, ck)
    want = {"a": 11.0, "b": 2.0}
    assert totals() == want

    # crash-replay of batch 1 (state committed, checkpoint didn't):
    # re-merge against v=0, not on top of its own earlier merge
    upsert_rollup_batch(spark, batch(b1), 1, ["k"], "v", state, ck)
    assert totals() == want
    # replay is idempotent arbitrarily many times
    upsert_rollup_batch(spark, batch(b1), 1, ["k"], "v", state, ck)
    assert totals() == want

    # a different checkpoint identity is refused outright
    with pytest.raises(ValueError, match="checkpoint"):
        upsert_rollup_batch(spark, batch(b1), 0, ["k"], "v", state, "ckpt-B")
    # rewinding below the committed head under the SAME checkpoint is
    # also refused (batch ids only ever replay the last batch)
    with pytest.raises(ValueError, match="rewind"):
        upsert_rollup_batch(spark, batch(b0), 0, ["k"], "v", state, ck)
    assert totals() == want


def test_streaming_session_window_matches_batch(spark, tmp_path):
    # Native session_window: same expression tree in streaming
    # (availableNow, watermark-evicted state) and batch must agree, and
    # the gap semantics must merge/split sessions correctly.
    import json as _json

    from kg_etl_spark.streaming.stateful import read_event_stream, session_window_agg

    src = tmp_path / "sess_in"
    src.mkdir()
    rows = [
        # user 1: two events 10 min apart (one session), then a 2h gap
        # (second session)
        {"event_id": 1, "user_id": 1, "event_type": "c", "value": 1.0,
         "ts": "2024-01-01T00:00:00.000Z"},
        {"event_id": 2, "user_id": 1, "event_type": "c", "value": 2.0,
         "ts": "2024-01-01T00:10:00.000Z"},
        {"event_id": 3, "user_id": 1, "event_type": "c", "value": 4.0,
         "ts": "2024-01-01T02:10:00.000Z"},
        # user 2: single event
        {"event_id": 4, "user_id": 2, "event_type": "c", "value": 8.0,
         "ts": "2024-01-01T00:05:00.000Z"},
    ]
    (src / "b.json").write_text("\n".join(_json.dumps(r) for r in rows))

    q = (
        session_window_agg(read_event_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["sum_value"], r["session_end_us"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }

    batch_df = spark.read.schema(
        "event_id long, user_id long, event_type string, value double, ts timestamp"
    ).json(str(src))
    want = {
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["sum_value"], r["session_end_us"])
        for r in session_window_agg(batch_df).collect()
    }
    assert got == want
    # user 1 splits into two sessions across the 2h gap; first merges
    # two events and extends 30min past the last one
    u1 = sorted(k[1] for k in got if k[0] == 1)
    assert len(u1) == 2
    first = got[(1, u1[0])]
    assert first[0] == 2 and first[1] == 3.0
    assert first[2] == u1[0] + (10 * 60 + 30 * 60) * 1_000_000
    assert got[(2, 1704067500000000)][0] == 1


def test_streaming_stateless_filter_pack(spark, tmp_path):
    # Corpus filters are stateless projections, so they lift to
    # Structured Streaming unchanged — the same operator object runs on
    # a readStream frame with no watermark/state plumbing.
    import json as _json

    from kg_etl_spark.operators.filters import gopher_quality_flags

    src = tmp_path / "docs_in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": " ".join(["the", "cats", "and", "dogs", "ran"] * 12)},
        {"doc_id": 2, "text": "too short"},
    ]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = (
        gopher_quality_flags(stream)
        .select("doc_id", "n_words", "pass_gopher")
        .writeStream.format("memory")
        .queryName("gopher_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM gopher_stream").collect()}
    batch = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            spark.read.schema("doc_id long, text string").json(str(src))
        ).collect()
    }
    assert got[1]["pass_gopher"] == batch[1]["pass_gopher"] is True
    assert got[2]["pass_gopher"] == batch[2]["pass_gopher"] is False


def test_python_datasource_sqlite_partitioned(spark, tmp_path):
    # Spark 4 Python DataSource API: rowid-range partitions read in
    # executors; results and partitioning both verified.
    import sqlite3

    db = tmp_path / "t.db"
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE pois (id INTEGER, name TEXT, score REAL)")
        conn.executemany(
            "INSERT INTO pois VALUES (?, ?, ?)",
            [(i, f"poi{i}", i / 4.0) for i in range(100)],
        )

    from kg_etl_spark.sources.pyds_sqlite import SQLiteDataSource

    try:
        spark.dataSource.register(SQLiteDataSource)
    except Exception as e:  # pragma: no cover - double-register in one session
        if "already" not in str(e).lower():
            raise
    df = (
        spark.read.format("sqlite_rows")
        .option("path", str(db))
        .option("table", "pois")
        .option("numPartitions", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = sorted((r["id"], r["name"], r["score"]) for r in df.collect())
    assert len(rows) == 100
    assert rows[0] == (0, "poi0", 0.0)
    assert rows[99] == (99, "poi99", 24.75)
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "score": "double"}


def test_synthdocs_datasource_deterministic(spark):
    from kg_etl_spark.sources.synthdocs import SynthDocsDataSource, synth_doc

    try:
        spark.dataSource.register(SynthDocsDataSource)
    except Exception as e:
        if "already" not in str(e).lower():
            raise
    df = (
        spark.read.format("synthdocs")
        .option("rows", "1000")
        .option("numPartitions", "7")
        .load()
    )
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 7
    # content is a pure function of doc_id — cross-check one row
    row = df.filter("doc_id = 123").collect()[0]
    assert tuple(row) == synth_doc(123)
    # different partitioning, identical rows
    df2 = (
        spark.read.format("synthdocs")
        .option("rows", "1000")
        .option("numPartitions", "3")
        .load()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, df2.collect()))


def test_streaming_incremental_dedup_foreachbatch(spark, tmp_path):
    # foreachBatch + the incremental fingerprint store = streaming
    # exact dedup with replay-safe first-seen-wins semantics.
    import json as _json

    from pyspark.sql import functions as F

    from kg_etl_spark.operators.incremental import incremental_exact_dedup

    src = tmp_path / "docs_stream"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "alpha beta"},
                {"doc_id": 2, "text": "gamma delta"},
                {"doc_id": 3, "text": "alpha  beta"},  # in-batch dup of 1
            ]
        )
    )
    (src / "b.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 10, "text": "ALPHA beta"},  # dup of batch-a keeper
                {"doc_id": 11, "text": "epsilon zeta"},  # fresh
            ]
        )
    )
    store = str(tmp_path / "fp_store")
    sink = str(tmp_path / "kept")
    spark.createDataFrame([], "fp string").write.mode("overwrite").parquet(store)

    def on_batch(batch_df, batch_id):
        seen = batch_df.sparkSession.read.parquet(store)
        fresh, new_fps = incremental_exact_dedup(batch_df, seen)
        fresh.write.mode("append").parquet(sink)
        new_fps.write.mode("append").parquet(store)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # force per-file micro-batches
        .json(str(src))
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    # one keeper per distinct normalized text, first batch wins
    assert kept == [1, 2, 11]
    assert spark.read.parquet(store).distinct().count() == 3


def test_streaming_incremental_minhash_foreachbatch(spark, tmp_path):
    # foreachBatch + the persistent LSH index = streaming NEAR-dup
    # detection: each micro-batch is banded once, probed against the
    # stored band table, then appended to it — the stored corpus is
    # never re-shingled (operators/dedup.py minhash_lsh_pairs_incremental).
    import json as _json

    from kg_etl_spark.operators.dedup import (
        LSH_FAMILY,
        minhash_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    near = base.replace("tok29", "tokX")
    other = " ".join(f"misc{i}" for i in range(30))
    rows_a = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": other},
        {"doc_id": 3, "text": near},  # in-batch near-dup of 1
    ]
    rows_b = [
        {"doc_id": 10, "text": base.replace("tok28", "tokY")},  # near-dup of 1 & 3
        {"doc_id": 11, "text": " ".join(f"fresh{i}" for i in range(30))},
    ]
    src = tmp_path / "nd_stream"
    src.mkdir()
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows_a))
    (src / "b.json").write_text("\n".join(_json.dumps(r) for r in rows_b))

    banded_store = str(tmp_path / "nd_banded")
    shingle_store = str(tmp_path / "nd_shingles")
    sink = str(tmp_path / "nd_pairs")
    spark.createDataFrame([], "_id long, band int, bh long").write.parquet(banded_store)
    spark.createDataFrame([], "_id long, _shh array<bigint>").write.parquet(shingle_store)

    def on_batch(batch_df, batch_id):
        s = batch_df.sparkSession
        index = {
            "banded": s.read.parquet(banded_store),
            "shingles": s.read.parquet(shingle_store),
            "family": LSH_FAMILY,
        }
        pairs = minhash_lsh_pairs_incremental(batch_df, index, "doc_id", threshold=0.5)
        pairs.write.mode("append").parquet(sink)
        fresh = minhash_index(batch_df, "doc_id")
        fresh["banded"].write.mode("append").parquet(banded_store)
        fresh["shingles"].write.mode("append").parquet(shingle_store)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["a_id"], r["b_id"]) for r in spark.read.parquet(sink).collect()
    }
    # union of per-batch incremental outputs == full-corpus pairs
    # (every pair is reported exactly when its LATER member arrives)
    all_rows = rows_a + rows_b
    full_df = spark.createDataFrame([(r["doc_id"], r["text"]) for r in all_rows],
                                    "doc_id long, text string")
    want = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(full_df, "doc_id", threshold=0.5).collect()
    }
    assert got == want
    assert (1, 3) in got and (1, 10) in got and (3, 10) in got


def test_streaming_sliding_window_matches_batch(spark, tmp_path):
    # sliding (overlapping) windows: every event lands in exactly
    # window/slide = 2 windows; stream result == batch result on the
    # same rows, and the per-window top type is derivable downstream.
    from kg_etl_spark.streaming.stateful import (
        read_event_stream,
        sliding_window_counts,
    )

    src = tmp_path / "ev_slide"
    src.mkdir()
    rows = [
        {"event_id": 1, "user_id": 1, "event_type": "click", "value": 1.0,
         "ts": "2024-01-01T00:10:00.000Z"},
        {"event_id": 2, "user_id": 2, "event_type": "click", "value": 2.0,
         "ts": "2024-01-01T00:40:00.000Z"},
        {"event_id": 3, "user_id": 3, "event_type": "view", "value": 4.0,
         "ts": "2024-01-01T00:40:00.000Z"},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))

    q = (
        sliding_window_counts(read_event_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("sliding_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sliding_stream").collect()
    }

    batch_df = spark.read.schema(
        "event_id long, user_id long, event_type string, value double, ts timestamp"
    ).json(str(src))
    want = {
        (r["win_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sliding_window_counts(batch_df).collect()
    }
    assert got == want
    # each event contributes to exactly 2 overlapping windows
    assert sum(n for n, _ in got.values()) == 2 * len(rows)
    # the [00:00, 01:00) window sees both clicks
    t0 = 1704067200000000
    assert got[(t0, "click")] == (2, 3.0)


def test_python_streaming_datasource_exactly_once(spark, tmp_path):
    # Spark 4 Python streaming DataSource: counter offsets, pure-
    # function rows -> every id delivered exactly once, values
    # reproducible from the id.
    import time

    from kg_etl_spark.sources.pystream_src import (
        SynthEventsDataSource,
        synth_event,
    )

    spark.dataSource.register(SynthEventsDataSource)
    q = (
        spark.readStream.format("synthevents")
        .option("total_rows", "100")
        .option("batch_rows", "30")
        .load()
        .writeStream.format("memory")
        .queryName("synth_events_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) c FROM synth_events_stream").collect()[0]["c"]
            if n >= 100:
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM synth_events_stream").collect()
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == list(range(100))  # exactly once, no gaps, no dups
    for r in rows[:10]:
        assert (
            r["event_id"], r["user_id"], r["event_type"], r["value"]
        ) == synth_event(r["event_id"])


def test_streaming_cms_matches_batch_sketch(spark, tmp_path):
    # linearity: the streamed (multi-batch, versioned-merge) CMS equals
    # the batch CMS over the union of rows, bit for bit — and the
    # estimates never underestimate the true counts.
    from kg_etl_spark.operators.sketches import cms_estimate
    from kg_etl_spark.streaming.cms_stream import cms_state_estimate, cms_stream

    src = tmp_path / "cms_in"
    src.mkdir()
    rows1 = [{"event_id": i, "user_id": i % 7, "event_type": "click", "value": 1.0,
              "ts": "2024-01-01T00:00:00.000Z"} for i in range(40)]
    rows2 = [{"event_id": 100 + i, "user_id": i % 3, "event_type": "view", "value": 1.0,
              "ts": "2024-01-01T01:00:00.000Z"} for i in range(30)]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))

    schema = "event_id long, user_id long, event_type string, value double, ts timestamp"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(str(src))
    )
    state_root = str(tmp_path / "cms_state")
    q = cms_stream(stream, "user_id", state_root, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    batch_df = spark.read.schema(schema).json(str(src))
    keys = batch_df.select("user_id").distinct()
    streamed = {
        r["user_id"]: r["cms_estimate"]
        for r in cms_state_estimate(spark, state_root, keys, "user_id").collect()
    }
    batch = {
        r["user_id"]: r["cms_estimate"]
        for r in cms_estimate(batch_df, keys, "user_id").collect()
    }
    assert streamed == batch
    true_counts = {
        r["user_id"]: r["n"]
        for r in batch_df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k, est in streamed.items():
        assert est >= true_counts[k]  # CMS never underestimates
