"""Laws for the versioned-table layer (sources/tablelog.py): atomic
publish, time travel / snapshot isolation, MERGE upsert semantics vs
a direct reconstruction, commit-race loser retry, vacuum's GC
candidate set, and content-preserving compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.sources import tablelog

from conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _daily(spark):
    txns = tables.transactions(spark, SF_DIR)
    return (
        txns.groupBy("store_id", "sale_date")
        .agg(F.sum("line_cents").alias("sales_c"))
        .limit(200)
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    d = _daily(spark)
    first = d.filter(F.col("store_id") == "0001")
    rest = d.filter(F.col("store_id") != "0001")

    v0 = tablelog.commit_version(spark, t, first, mode="overwrite")
    v1 = tablelog.commit_version(spark, t, rest, mode="append")
    assert (v0, v1) == (0, 1)
    assert tablelog.latest_version(t) == 1
    # append stacked the content
    assert _rows(tablelog.read_version(spark, t)) == _rows(d)
    # snapshot isolation: v0 still reads exactly the first slice
    assert _rows(tablelog.read_version(spark, t, 0)) == _rows(first)

    # overwrite replaces logical content; old versions intact
    v2 = tablelog.commit_version(spark, t, first, mode="overwrite")
    assert v2 == 2
    assert _rows(tablelog.read_version(spark, t)) == _rows(first)
    assert _rows(tablelog.read_version(spark, t, 1)) == _rows(d)
    assert [m["version"] for m in tablelog.history(t)] == [0, 1, 2]


def test_merge_upsert_matches_reconstruction(spark, tmp_path):
    t = str(tmp_path / "t")
    d = _daily(spark).withColumn(
        "k", F.concat_ws("|", "store_id", "sale_date")
    )
    tablelog.commit_version(spark, t, d, mode="overwrite")
    # updates: change half the existing keys, insert two new ones
    updates = (
        d.limit(50)
        .withColumn("sales_c", F.col("sales_c") + 7)
        .unionByName(
            spark.createDataFrame(
                [
                    ("9999", "2099-01-01", 1, "9999|2099-01-01"),
                    ("9998", "2099-01-02", 2, "9998|2099-01-02"),
                ],
                "store_id string, sale_date string, sales_c long,"
                " k string",
            )
        )
    )
    tablelog.merge_upsert(spark, t, updates, "k")
    got = tablelog.read_version(spark, t)
    want = d.join(updates.select("k"), "k", "left_anti").unionByName(
        updates
    )
    assert _rows(got.select("k", "sales_c")) == _rows(
        want.select("k", "sales_c")
    )
    # exactly one row per key survived
    assert got.groupBy("k").count().filter("count > 1").count() == 0


def test_commit_race_loser_retries(spark, tmp_path):
    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d, mode="overwrite")
    # simulate a racer that claims version 1 out from under us
    os.makedirs(os.path.dirname(tablelog._manifest_path(t, 1)),
                exist_ok=True)
    with open(tablelog._manifest_path(t, 1), "w") as f:
        f.write(
            '{"version": 1, "op": "racer", "mode": "overwrite",'
            ' "data_dirs": [], "n_rows_written": 0}'
        )
    v = tablelog.commit_version(spark, t, d.limit(10), mode="append")
    assert v == 2  # the loser re-read the head and took the next slot
    # and its append stacked on the RACER's (empty) content, not the
    # stale pre-race head — the retry re-derived lineage
    m = tablelog.history(t)[2]
    assert len(m["data_dirs"]) == 1  # racer had no files


def test_vacuum_lists_only_unreferenced(spark, tmp_path):
    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d, mode="overwrite")
    tablelog.commit_version(
        spark, t, d.limit(5), mode="overwrite"
    )
    candidates = tablelog.vacuum(t, keep_versions=1)
    # exactly version 0's data dir is GC-able
    assert candidates == tablelog.history(t)[0]["data_dirs"]
    # keeping both versions yields nothing to GC
    assert tablelog.vacuum(t, keep_versions=2) == []


def test_compact_preserves_content(spark, tmp_path):
    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(
        spark, t, d.repartition(8), mode="overwrite"
    )
    tablelog.compact(spark, t, n_files=1)
    assert _rows(tablelog.read_version(spark, t)) == _rows(d)
    newest = tablelog.history(t)[-1]
    files = [
        f
        for f in os.listdir(newest["data_dirs"][0])
        if f.endswith(".parquet")
    ]
    assert len(files) == 1


def test_change_feed_tags_insert_update_delete(spark, tmp_path):
    t = str(tmp_path / "t")
    d = _daily(spark).withColumn(
        "k", F.concat_ws("|", "store_id", "sale_date")
    )
    tablelog.commit_version(spark, t, d, mode="overwrite")
    # next version: drop 10 keys, bump 20, insert 1
    dropped = d.limit(10)
    bumped = (
        d.join(dropped.select("k"), "k", "left_anti")
        .limit(20)
        .withColumn("sales_c", F.col("sales_c") + 1)
    )
    kept = d.join(dropped.select("k"), "k", "left_anti").join(
        bumped.select("k"), "k", "left_anti"
    )
    new_row = spark.createDataFrame(
        [("9999", "2099-01-01", 5, "9999|2099-01-01")],
        "store_id string, sale_date string, sales_c long, k string",
    )
    v2 = kept.unionByName(bumped).unionByName(new_row)
    tablelog.commit_version(spark, t, v2, mode="overwrite")

    feed = tablelog.changes_between(spark, t, "k", 0, 1)
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r["change_type"], set()).add(r["k"])
    assert by_type["insert"] == {"9999|2099-01-01"}
    assert by_type["delete"] == {r["k"] for r in dropped.collect()}
    assert by_type["update"] == {r["k"] for r in bumped.collect()}
    # updated rows carry the NEW content
    upd = {r["k"]: r["sales_c"] for r in feed.collect()
           if r["change_type"] == "update"}
    want = {r["k"]: r["sales_c"] for r in bumped.collect()}
    assert upd == want


def test_stream_batch_commit_is_exactly_once(spark, tmp_path):
    t = str(tmp_path / "t")
    d = _daily(spark)
    b0, b1 = d.limit(40), d.limit(80).subtract(d.limit(40))
    assert tablelog.commit_stream_batch(spark, t, b0, batch_id=0) == 0
    assert tablelog.commit_stream_batch(spark, t, b1, batch_id=1) == 1
    n = tablelog.read_version(spark, t).count()
    # replay batch 1 (checkpoint lost after sink write): no-op
    assert tablelog.commit_stream_batch(spark, t, b1, batch_id=1) is None
    assert tablelog.read_version(spark, t).count() == n
    assert tablelog.committed_batch_ids(t) == {0, 1}


def test_stream_sink_end_to_end_exactly_once(spark, tmp_path):
    # drive a real file stream through foreachBatch into the versioned
    # sink, then REPLAY the whole stream from a fresh checkpoint: the
    # batch ledger absorbs every duplicate delivery
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, f"e{i}") for j in range(5)],
            "event_id long, event_type string",
        ).coalesce(1).write.mode("overwrite").json(str(src / f"f{i}"))
    t = str(tmp_path / "t")

    def run(ckpt):
        stream = (
            spark.readStream.schema("event_id long, event_type string")
            .option("maxFilesPerTrigger", "1")
            .json(str(src / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: tablelog.commit_stream_batch(
                    spark, t, df, bid
                )
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ckpt1")
    n = tablelog.read_version(spark, t).count()
    assert n == 15
    run("ckpt2")  # fresh checkpoint: every batch redelivered
    assert tablelog.read_version(spark, t).count() == n


# ---- model-based law: random command sequences vs an in-memory model


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_POOL = {
    0: [(1, 10), (2, 20)],
    1: [(2, 21), (3, 30)],
    2: [(4, 40)],
    3: [(1, 11), (4, 41), (5, 50)],
}

_cmd = st.tuples(
    st.sampled_from(["overwrite", "append", "merge"]),
    st.sampled_from(sorted(_POOL)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cmds=st.lists(_cmd, min_size=1, max_size=5))
def test_tablelog_matches_model(spark, tmp_path_factory, cmds):
    t = str(tmp_path_factory.mktemp("tlog"))
    model: list[list[tuple]] = []

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, v long")

    for op, pid in cmds:
        rows = _POOL[pid]
        if op == "overwrite":
            tablelog.commit_version(spark, t, df_of(rows), mode="overwrite")
            model.append(sorted(rows))
        elif op == "append":
            tablelog.commit_version(spark, t, df_of(rows), mode="append")
            prev = model[-1] if model else []
            model.append(sorted(prev + rows))
        else:  # merge on k — replaces MATCHED keys, keeps everything
            # else as-is (unmatched duplicate keys from prior appends
            # survive: MERGE only promises uniqueness for keys it
            # touched; collapsing the whole table would silently drop
            # rows the command never addressed)
            tablelog.merge_upsert(spark, t, df_of(rows), "k")
            upd = dict(rows)
            prev = model[-1] if model else []
            model.append(
                sorted([r for r in prev if r[0] not in upd] + rows)
            )

    assert tablelog.latest_version(t) == len(model) - 1
    for v, want in enumerate(model):
        got = sorted(
            (r["k"], r["v"])
            for r in tablelog.read_version(spark, t, v).collect()
        )
        assert got == want, f"version {v}: {got} != {want}"


def test_append_refuses_schema_drift(spark, tmp_path):
    import pytest as _pytest

    t = str(tmp_path / "t")
    tablelog.commit_version(
        spark, t, _daily(spark), mode="overwrite"
    )
    drifted = _daily(spark).withColumn("extra", F.lit(1))
    with _pytest.raises(ValueError, match="schema"):
        tablelog.commit_version(spark, t, drifted, mode="append")
    # an intentional schema change commits as overwrite
    v = tablelog.commit_version(spark, t, drifted, mode="overwrite")
    assert "extra" in tablelog.read_version(spark, t, v).columns


def test_restore_rolls_back_o1(spark, tmp_path):
    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d, mode="overwrite")
    tablelog.commit_version(spark, t, d.limit(3), mode="overwrite")
    v = tablelog.restore(spark, t, 0)
    assert v == 2
    assert _rows(tablelog.read_version(spark, t)) == _rows(d)
    # rolled-back state still time-travelable
    assert tablelog.read_version(spark, t, 1).count() == 3
    assert tablelog.history(t)[2]["op"] == "restore_v0"


def test_manifest_publish_is_atomic_no_partial_visible(spark, tmp_path):
    """The _log dir must never contain a visible-but-incomplete
    manifest: every *.json parses, temps are invisible to
    latest_version (ADVICE r4: O_CREAT|O_EXCL made the name visible
    before the body landed)."""
    import json as _json

    t = str(tmp_path / "t")
    d = _daily(spark)
    for i in range(3):
        tablelog.commit_version(
            spark, t, d.limit(10 + i), mode="overwrite"
        )
    log = tablelog._log_dir(t)
    for f in os.listdir(log):
        assert f.endswith(".json"), f"leftover temp {f}"
        with open(os.path.join(log, f)) as fh:
            _json.load(fh)  # every visible manifest is complete
    # a stranded temp from a crashed writer is ignored by readers
    with open(os.path.join(log, "000000000099.deadbeef.tmp"), "w") as fh:
        fh.write("{partial")
    assert tablelog.latest_version(t) == 2


def test_merge_pinned_to_head_raises_conflict(spark, tmp_path):
    """commit_version(expect_head=...) aborts with CommitConflict when
    the head moved — the lost-update guard merge_upsert relies on
    (ADVICE r4: the loser used to re-claim the next version but commit
    its stale reconcile, silently dropping the concurrent commit)."""
    import pytest as _pytest

    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d, mode="overwrite")  # head = 0
    with _pytest.raises(tablelog.CommitConflict, match="head moved"):
        tablelog.commit_version(
            spark, t, d.limit(5),
            mode="overwrite", op="merge", expect_head=None,
        )
    # pinning the CURRENT head commits normally
    v = tablelog.commit_version(
        spark, t, d.limit(5),
        mode="overwrite", op="merge", expect_head=0,
    )
    assert v == 1


def test_append_after_restore_of_schemaless_version(spark, tmp_path):
    """A restore of a version whose manifest predates schema recording
    writes schema=null; the next append must skip validation, not
    crash (ADVICE r4: TypeError on iterating None)."""
    import json as _json

    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d, mode="overwrite")
    # simulate a legacy manifest: strip the recorded schema from v0
    p = tablelog._manifest_path(t, 0)
    with open(p) as fh:
        m = _json.load(fh)
    del m["schema"]
    os.unlink(p)
    with open(p, "w") as fh:
        _json.dump(m, fh)
    tablelog.restore(spark, t, 0)  # head manifest now has schema=None
    v = tablelog.commit_version(spark, t, d.limit(5), mode="append")
    assert v == 2
    assert tablelog.read_version(spark, t).count() == d.count() + 5


def test_stream_batch_records_schema_for_drift_guard(spark, tmp_path):
    import pytest as _pytest

    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_stream_batch(spark, t, d.limit(5), batch_id=0)
    assert tablelog.history(t)[0]["schema"] is not None
    drifted = d.withColumn("extra", F.lit(1))
    with _pytest.raises(ValueError, match="schema"):
        tablelog.commit_version(spark, t, drifted, mode="append")


def test_vacuum_grace_protects_inflight_staging(spark, tmp_path):
    """An unreferenced staged dir younger than the grace period is NOT
    a GC candidate (it may be an in-flight commit whose manifest
    hasn't landed); committed-but-superseded dirs are candidates at
    any age (ADVICE r4)."""
    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d, mode="overwrite")
    tablelog.commit_version(spark, t, d.limit(5), mode="overwrite")
    # an in-flight writer's fresh staging dir, no manifest yet
    inflight = os.path.join(t, "data", "staged-inflight00000")
    os.makedirs(inflight)
    cands = tablelog.vacuum(t, keep_versions=1)
    assert inflight not in cands
    # v0's dir IS a candidate despite being just as fresh
    assert cands == tablelog.history(t)[0]["data_dirs"]
    # with writers quiesced (grace 0) the orphan becomes collectable
    assert inflight in tablelog.vacuum(t, keep_versions=1,
                                       grace_seconds=0)


def test_stream_batch_append_refuses_schema_drift(spark, tmp_path):
    """The drift guard covers the STREAM commit path too: a
    schema-drifted micro-batch append must be refused at commit time,
    exactly like a drifted batch append — otherwise it extends
    data_dirs with mixed-schema files and poisons every later
    multi-directory read (ADVICE r5)."""
    import pytest as _pytest

    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_stream_batch(spark, t, d.limit(5), batch_id=0)
    drifted = d.limit(3).withColumn("extra", F.lit(1))
    with _pytest.raises(ValueError, match="schema"):
        tablelog.commit_stream_batch(spark, t, drifted, batch_id=1)
    # the refused batch landed nothing: head unchanged, ledger clean
    assert tablelog.latest_version(t) == 0
    assert tablelog.committed_batch_ids(t) == {0}


def test_vacuum_lists_stale_tmp_manifests(spark, tmp_path):
    """A crash between _try_publish's tmp write and its link strands a
    _log/*.tmp manifest; vacuum lists it (past the grace) so orphans
    do not accumulate forever (ADVICE r5: the docstring used to claim
    this without the code doing it)."""
    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d.limit(5), mode="overwrite")
    log_dir = os.path.join(t, "_log")
    stale = os.path.join(log_dir, "000000000007.deadbeef.tmp")
    fresh = os.path.join(log_dir, "000000000008.cafebabe.tmp")
    for p in (stale, fresh):
        with open(p, "w") as f:
            f.write("{}")
    os.utime(stale, (1, 1))  # ancient
    cands = tablelog.vacuum(t, keep_versions=1)
    assert stale in cands
    assert fresh not in cands  # inside the grace: may be mid-publish
    # committed manifests are never candidates
    assert all(not c.endswith(".json") for c in cands)


def test_vacuum_grace_keys_off_commit_activity(spark, tmp_path):
    """The grace window must track COMMIT activity, not write
    completion: parquet mtimes freeze when the write finishes, so a
    commit stalled between write and publish longer than the grace
    used to be mislisted while still in flight (ADVICE r5). Publish
    attempts re-touch a _COMMITTING marker inside the staged dir and
    vacuum ages the NEWEST mtime in the dir."""
    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d, mode="overwrite")
    tablelog.commit_version(spark, t, d.limit(5), mode="overwrite")
    # simulate a stalled writer: staged long ago (dir + files ancient)
    # but its committer is alive and re-touching the marker
    stalled = os.path.join(t, "data", "staged-stalled0000000")
    os.makedirs(stalled)
    part = os.path.join(stalled, "part-00000.parquet")
    with open(part, "w") as f:
        f.write("x")
    tablelog._touch_in_flight(stalled)
    os.utime(stalled, (1, 1))
    os.utime(part, (1, 1))
    assert stalled not in tablelog.vacuum(t, keep_versions=1)
    # once the marker itself ages out, the dir is abandoned: candidate
    os.utime(os.path.join(stalled, tablelog._IN_FLIGHT_MARKER), (1, 1))
    assert stalled in tablelog.vacuum(t, keep_versions=1)


def test_committed_staged_dir_has_marker_ignored_by_readers(
    spark, tmp_path
):
    """The _COMMITTING marker stays behind in committed data dirs;
    parquet readers must ignore it (underscore prefix convention)."""
    t = str(tmp_path / "t")
    d = _daily(spark)
    tablelog.commit_version(spark, t, d.limit(5), mode="overwrite")
    staged = tablelog.history(t)[0]["data_dirs"][0]
    assert os.path.exists(
        os.path.join(staged, tablelog._IN_FLIGHT_MARKER)
    )
    assert _rows(tablelog.read_version(spark, t)) == _rows(d.limit(5))


_fcmd = st.tuples(
    st.sampled_from(["overwrite", "append", "merge"]),
    st.sampled_from(sorted(_POOL)),
    st.booleans(),  # commit WITH fingerprint_cols?
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cmds=st.lists(_fcmd, min_size=1, max_size=5))
def test_ledger_fingerprint_matches_model(spark, tmp_path_factory, cmds):
    """Model-based law for the r9 ledger fingerprint (r10 semantics:
    ``fingerprint_cols=None`` INHERITS the head's columns, so a
    forgetful writer no longer breaks the chain): under ANY
    interleaving of fingerprinted / unfingerprinted overwrite, append,
    and merge commits, every version's ledger pair either equals the
    Spark scan pair over that version's content or is None exactly
    when the cumulative pair is unknowable — the first commit passing
    no cols, or any append onto an unfingerprinted head (explicit
    cols can't resume mid-chain there; only an overwrite/merge with
    cols restarts it)."""
    from pyspark.sql import functions as F

    cols = ["k", "v"]

    def scan_fp(df):
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"] or 0) % (1 << 64)

    t = str(tmp_path_factory.mktemp("tlogfp"))
    known: list[bool] = []  # per version: ledger pair expected?

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, v long")

    for op, pid, with_fp in cmds:
        fp_cols = cols if with_fp else None
        rows = _POOL[pid]
        prev_known = known[-1] if known else False
        empty = not known
        if op == "overwrite":
            tablelog.commit_version(
                spark, t, df_of(rows), mode="overwrite",
                fingerprint_cols=fp_cols,
            )
            # None-default inherits the head's cols; explicit cols
            # always (re)start the chain on an overwrite
            known.append(with_fp or prev_known)
        elif op == "append":
            tablelog.commit_version(
                spark, t, df_of(rows), mode="append",
                fingerprint_cols=fp_cols,
            )
            # onto a fingerprinted head the pair merges whether cols
            # were explicit or inherited; onto an unfingerprinted
            # nonempty head it is unknowable either way; an append
            # creating the table records the shard pair iff cols
            # were passed (nothing to inherit from)
            known.append(with_fp if empty else prev_known)
        else:  # merge commits as overwrite
            tablelog.merge_upsert(
                spark, t, df_of(rows), "k", fingerprint_cols=fp_cols
            )
            known.append(with_fp or prev_known)

    for v, want_known in enumerate(known):
        led = tablelog.ledger_fingerprint(t, cols, version=v)
        if want_known:
            assert led == scan_fp(
                tablelog.read_version(spark, t, v)
            ), f"version {v}"
        else:
            assert led is None, f"version {v}: expected None, got {led}"


def test_read_commit_shard_returns_exactly_the_added_rows(
    spark, tmp_path
):
    """read_commit_shard(v) is the rows commit v WROTE (its own staged
    files), for first commit, appends, and overwrites — the input the
    corpus ingest layer feeds artifact advances so they derive from
    the same bytes the ledger fingerprint hashed (ADVICE r10)."""
    t = str(tmp_path / "t")
    base = _daily(spark)
    a = base.filter(F.col("store_id") % 2 == 0)
    b = base.filter(F.col("store_id") % 2 == 1)
    tablelog.commit_version(spark, t, a, mode="append")
    tablelog.commit_version(spark, t, b, mode="append")
    tablelog.commit_version(spark, t, a, mode="overwrite")
    assert _rows(tablelog.read_commit_shard(spark, t, 0)) == _rows(a)
    assert _rows(tablelog.read_commit_shard(spark, t, 1)) == _rows(b)
    # overwrite: the added dirs ARE the whole logical content
    assert _rows(tablelog.read_commit_shard(spark, t, 2)) == _rows(a)
    # each shard read touches ONLY files outside the parent's listing
    v0 = set(tablelog.read_version(spark, t, 0).inputFiles())
    v1_shard = set(tablelog.read_commit_shard(spark, t, 1).inputFiles())
    assert v1_shard and not (v1_shard & v0)
