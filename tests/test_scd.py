"""SCD2 merge tests (operators/scd.py): change expiry, no-op identity,
inserts, NULL-safe comparison, and multi-batch history growth."""

from __future__ import annotations

from kg_etl_spark.operators.scd import scd2_apply, scd2_init


def _rows(df):
    return {
        (r["k"], r["valid_from"], r["valid_to"]): (r["v"], r["seg"]) for r in df.collect()
    }


def test_scd2_expire_insert_noop_and_nulls(spark):
    snap = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c")], ["k", "v", "seg"]
    )
    dim = scd2_init(snap, "k", ["v", "seg"], batch_id=0)

    updates = spark.createDataFrame(
        [
            (1, 11.0, "a"),   # changed -> expire + new version
            (2, 20.0, "b"),   # identical -> no-op
            (3, None, "c"),   # identical incl. NULL -> no-op (eqNullSafe)
            (4, 40.0, "d"),   # brand-new key
        ],
        ["k", "v", "seg"],
    )
    out = _rows(scd2_apply(dim, updates, "k", ["v", "seg"], batch_id=1))
    assert out[(1, 0, 1)] == (10.0, "a")       # expired old version
    assert out[(1, 1, None)] == (11.0, "a")    # opened new version
    assert out[(2, 0, None)] == (20.0, "b")    # untouched
    assert out[(3, 0, None)] == (None, "c")    # NULL == NULL -> untouched
    assert out[(4, 1, None)] == (40.0, "d")    # insert
    assert len(out) == 5


def test_scd2_history_accumulates_over_batches(spark):
    snap = spark.createDataFrame([(1, 1.0, "x")], ["k", "v", "seg"])
    dim = scd2_init(snap, "k", ["v", "seg"], batch_id=0)
    for b, val in ((1, 2.0), (2, 3.0)):
        upd = spark.createDataFrame([(1, val, "x")], ["k", "v", "seg"])
        dim = scd2_apply(dim, upd, "k", ["v", "seg"], batch_id=b)
    out = _rows(dim)
    assert out == {
        (1, 0, 1): (1.0, "x"),
        (1, 1, 2): (2.0, "x"),
        (1, 2, None): (3.0, "x"),
    }


def test_snapshot_diff_null_safe_and_statuses(spark):
    from kg_etl_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 5.0, "c"), (4, 1.0, "d")],
        "k long, bal double, seg string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 6.0, "c"), (5, 9.0, "e")],
        "k long, bal double, seg string",
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"], ["bal", "seg"]).collect()}
    assert out[1]["diff_status"] == "unchanged"
    assert out[2]["diff_status"] == "unchanged"  # NULL == NULL under eqNullSafe
    assert out[3]["diff_status"] == "changed" and out[3]["first_diff_col"] == "bal"
    assert out[4]["diff_status"] == "removed"
    assert out[5]["diff_status"] == "added"


def test_cdc_apply_last_op_wins(spark):
    from kg_etl_spark.operators.scd import cdc_apply

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    oplog = spark.createDataFrame(
        [
            (1, 100, "U", 11.0),
            (1, 101, "U", 12.0),   # later seq wins
            (2, 200, "D", None),   # delete
            (3, 300, "D", None),
            (3, 301, "I", 33.0),   # re-insert after delete
            (5, 500, "I", 50.0),   # brand-new key
        ],
        "k long, seq long, op string, v double",
    )
    got = {r["k"]: r["v"] for r in cdc_apply(base, oplog, "k", "seq", "op", ["v"]).collect()}
    assert got == {1: 12.0, 3: 33.0, 4: 40.0, 5: 50.0}  # 2 deleted, 4 untouched


def test_scd2_pit_join_selects_correct_version(spark):
    from kg_etl_spark.operators.scd import scd2_pit_join

    dim = spark.createDataFrame(
        [
            (1, 10.0, 0, 5),     # key 1: v10 during [0,5)
            (1, 11.0, 5, None),  # then v11 open-ended
            (2, 20.0, 0, None),  # key 2: single open version
        ],
        "k long, v double, valid_from long, valid_to long",
    )
    facts = spark.createDataFrame(
        [(100, 1, 0), (101, 1, 4), (102, 1, 5), (103, 1, 9), (104, 2, 7), (105, 3, 1)],
        "fid long, k long, t long",
    )
    got = {r["fid"]: r["v"] for r in scd2_pit_join(facts, dim, "k", "t").collect()}
    assert got == {100: 10.0, 101: 10.0, 102: 11.0, 103: 11.0, 104: 20.0}
    # fact 105: key absent from the dimension -> dropped (inner semantics)
