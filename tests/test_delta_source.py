"""Delta as a registered Python Data Source (batch + streaming) —
``spark.read.format("deltalog")`` must match ``read_delta`` on every
golden fixture shape (partitioned, deletion vectors, name- and id-mode
column mapping), and ``spark.readStream.format("deltalog")`` must
stream exactly the appended commits with Delta's append-only contract
(change commits raise; skipChangeCommits skips)."""

from __future__ import annotations

import os

import pytest

from tests.conftest import long_suite

pytestmark = long_suite

from sustainable_building_energy_benchmarking_pipeline_spark.sources import deltalog as dl
from sustainable_building_energy_benchmarking_pipeline_spark.sources.delta_stream_source import (
    DeltaLogDataSource,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(DeltaLogDataSource)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "fixture",
    [
        "golden_delta",
        "golden_delta_dv",
        "golden_delta_cm",
        "golden_delta_cmid",
        "golden_delta_cm_nested",
        "golden_delta_tw",
    ],
)
def test_batch_source_matches_read_delta(spark, fixture):
    """One partition per active file; hive partition values, deletion
    vectors and both column-mapping modes must come out exactly as the
    native read path produces them."""
    path = os.path.join(DATA, fixture)
    via_source = spark.read.format("deltalog").load(path)
    native = dl.read_delta(spark, path)
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.delta_stream_source import (
        _strip_field_metadata,
    )

    # the source strips Delta bookkeeping (typeChanges etc.) from field
    # metadata; names+types must agree exactly
    assert via_source.schema == _strip_field_metadata(native.schema)
    assert _rows(via_source) == _rows(native)


def test_batch_source_version_as_of(spark):
    path = os.path.join(DATA, "golden_delta_dv")
    v0 = spark.read.format("deltalog").option("versionAsOf", 0).load(path)
    assert v0.count() == 12  # before the DV DELETE commit
    head = spark.read.format("deltalog").load(path)
    assert head.count() == 9


def test_stream_source_appends_and_change_contract(spark, tmp_path):
    """Micro-batches cover commit windows: the initial batch replays
    history, each append lands as its own batch, a data-changing commit
    raises (append-only contract), and skipChangeCommits resumes past
    it."""
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    dl.write_delta(df.coalesce(1), path)

    def _start(**source_opts):
        reader = spark.readStream.format("deltalog")
        for k, v in source_opts.items():
            reader = reader.option(k, v)
        return (
            reader.load(path)
            .writeStream.format("parquet")  # file sink: checkpoint-recoverable
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def _sink_rows():
        return _rows(spark.read.schema("id long, s string").parquet(out))

    q = _start()
    try:
        q.processAllAvailable()
        assert _sink_rows() == [(1, "a"), (2, "b")]

        dl.write_delta(
            spark.createDataFrame([(3, "c")], "id long, s string").coalesce(1),
            path,
            mode="append",
        )
        q.processAllAvailable()
        assert _sink_rows() == [(1, "a"), (2, "b"), (3, "c")]

        # a DELETE rewrites a file: the append-only stream must fail
        dl.delete_delta(spark, path, "id = 1")
        with pytest.raises(Exception, match="skipChangeCommits|data-changing"):
            q.processAllAvailable()
    finally:
        q.stop()

    # restart WITH skipChangeCommits from the SAME checkpoint: the
    # change commit is skipped, later appends flow again
    q2 = _start(skipChangeCommits="true")
    try:
        q2.processAllAvailable()
        dl.write_delta(
            spark.createDataFrame([(4, "d")], "id long, s string").coalesce(1),
            path,
            mode="append",
        )
        q2.processAllAvailable()
        rows = set(_sink_rows())
        assert (4, "d") in rows  # the post-delete append flowed
        # the delete commit's rewritten file was skipped, so the sink
        # still holds the pre-delete appends and nothing from v(delete)
        assert rows == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    finally:
        q2.stop()


def test_stream_source_starting_version(spark, tmp_path):
    """startingVersion=latest streams only commits AFTER stream start;
    an integer startingVersion replays from that commit on."""
    path = str(tmp_path / "sv")
    dl.write_delta(
        spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1), path
    )
    dl.write_delta(
        spark.createDataFrame([(2, 2.0)], "id long, v double").coalesce(1),
        path,
        mode="append",
    )

    q = (
        spark.readStream.format("deltalog")
        .option("startingVersion", "latest")
        .load(path)
        .writeStream.format("memory")
        .queryName("dsrc_sv")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("dsrc_sv").count() == 0  # history skipped
        dl.write_delta(
            spark.createDataFrame([(3, 3.0)], "id long, v double").coalesce(1),
            path,
            mode="append",
        )
        q.processAllAvailable()
        assert _rows(spark.table("dsrc_sv")) == [(3, 3.0)]
    finally:
        q.stop()

    q2 = (
        spark.readStream.format("deltalog")
        .option("startingVersion", 1)
        .load(path)
        .writeStream.format("memory")
        .queryName("dsrc_sv2")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q2.processAllAvailable()
        assert _rows(spark.table("dsrc_sv2")) == [(2, 2.0), (3, 3.0)]
    finally:
        q2.stop()


def test_stream_source_schema_change_raises(spark, tmp_path):
    path = str(tmp_path / "sc")
    dl.write_delta(
        spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1), path
    )
    q = (
        spark.readStream.format("deltalog")
        .load(path)
        .writeStream.format("memory")
        .queryName("dsrc_sc")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        dl.write_delta(
            spark.createDataFrame(
                [(2, 2.0, "x")], "id long, v double, extra string"
            ).coalesce(1),
            path,
            mode="append",
            merge_schema=True,
        )
        with pytest.raises(Exception, match="schema changed"):
            q.processAllAvailable()
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# Write path (round-9): df.write.format("deltalog") / writeStream sink
# ---------------------------------------------------------------------------


def test_batch_writer_append_and_overwrite(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id bigint, v double")
    df.write.format("deltalog").mode("append").save(path)
    assert _rows(dl.read_delta(spark, path)) == [(1, 1.0), (2, 2.0)]
    # append accumulates
    spark.createDataFrame([(3, 3.0)], "id bigint, v double").write.format(
        "deltalog"
    ).mode("append").save(path)
    assert _rows(dl.read_delta(spark, path)) == [(1, 1.0), (2, 2.0), (3, 3.0)]
    # overwrite replaces; time travel still sees v0
    spark.createDataFrame([(9, 9.0)], "id bigint, v double").write.format(
        "deltalog"
    ).mode("overwrite").save(path)
    assert _rows(dl.read_delta(spark, path)) == [(9, 9.0)]
    assert _rows(dl.read_delta(spark, path, version=0)) == [(1, 1.0), (2, 2.0)]
    # adds carry stats (data skipping works on source-written tables)
    active, _, _, _ = dl._replay(path, None)
    assert all(a.get("stats") for a in active.values())


def test_batch_writer_partitioned_new_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "en", 1.0), (2, "pt:BR", 2.0), (3, None, 3.0)],
        "id bigint, lang string, v double",
    )
    df.write.format("deltalog").option("partitionBy", "lang").mode(
        "append"
    ).save(path)
    active, _, pcols, _ = dl._replay(path, None)
    assert pcols == ["lang"]
    dirs = {rel.rsplit("/", 1)[0] for rel in active}
    # hive escaping + null partition dir, logical values in the log
    assert dirs == {"lang=en", "lang=pt%3ABR", "lang=__HIVE_DEFAULT_PARTITION__"}
    assert {a["partitionValues"]["lang"] for a in active.values()} == {
        "en", "pt:BR", None,
    }
    back = dl.read_delta(spark, path)
    assert _rows(back) == [(1, "en", 1.0), (2, "pt:BR", 2.0), (3, None, 3.0)]
    # and the source's own batch reader round-trips it
    assert _rows(spark.read.format("deltalog").load(path)) == _rows(back)
    # partition pruning works on writer-produced partitionValues
    en = dl.read_delta(spark, path, partition_filter={"lang": "en"})
    assert [r["id"] for r in en.collect()] == [1]


def test_batch_writer_adopts_partitioning_on_append(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", 1.0)], "id bigint, p string, v double")
    dl.write_delta(df, path, partition_by=["p"])
    spark.createDataFrame(
        [(2, "b", 2.0)], "id bigint, p string, v double"
    ).write.format("deltalog").mode("append").save(path)
    active, _, _, _ = dl._replay(path, None)
    assert any(rel.startswith("p=b/") for rel in active)
    assert _rows(dl.read_delta(spark, path)) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_batch_writer_schema_mismatch_and_gates(spark, tmp_path):
    from py4j.protocol import Py4JJavaError

    path = str(tmp_path / "t")
    dl.write_delta(
        spark.createDataFrame([(1, 1.0)], "id bigint, v double"), path
    )
    bad = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(Exception, match="schema mismatch"):
        bad.write.format("deltalog").mode("append").save(path)
    # CHECK constraints can't be evaluated by this writer — refuse
    dl.add_constraint(spark, path, "v_pos", "v >= 0")
    df = spark.createDataFrame([(2, 2.0)], "id bigint, v double")
    with pytest.raises(Exception, match="constraint"):
        df.write.format("deltalog").mode("append").save(path)


def test_batch_writer_append_only_blocks_overwrite(spark, tmp_path):
    path = str(tmp_path / "t")
    dl.write_delta(
        spark.createDataFrame([(1, 1.0)], "id bigint, v double"), path
    )
    dl.set_table_properties(path, {"delta.appendOnly": "true"})
    df = spark.createDataFrame([(2, 2.0)], "id bigint, v double")
    df.write.format("deltalog").mode("append").save(path)  # appends fine
    with pytest.raises(Exception, match="appendOnly"):
        df.write.format("deltalog").mode("overwrite").save(path)


def test_stream_writer_micro_batches_commit_atomically(spark, tmp_path):
    """writeStream.format('deltalog'): each micro-batch is one Delta
    commit carrying a txn action; the table is readable mid-stream."""
    src = str(tmp_path / "src")
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame([(1, 1.0)], "id bigint, v double").write.parquet(src)
    stream = spark.readStream.schema("id bigint, v double").parquet(src)
    q = (
        stream.writeStream.format("deltalog")
        .option("path", path)
        .option("txnAppId", "stream-sink-test")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(dl.read_delta(spark, path)) == [(1, 1.0)]
    assert dl.last_txn_version(path, "stream-sink-test") >= 0
    # second micro-batch appends
    spark.createDataFrame([(2, 2.0)], "id bigint, v double").write.mode(
        "append"
    ).parquet(src)
    q = (
        spark.readStream.schema("id bigint, v double").parquet(src)
        .writeStream.format("deltalog")
        .option("path", path)
        .option("txnAppId", "stream-sink-test")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(dl.read_delta(spark, path)) == [(1, 1.0), (2, 2.0)]


def test_stream_writer_into_partitioned_table(spark, tmp_path):
    src = str(tmp_path / "src")
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id bigint, p string, v double"
    ).write.parquet(src)
    q = (
        spark.readStream.schema("id bigint, p string, v double").parquet(src)
        .writeStream.format("deltalog")
        .option("path", path)
        .option("partitionBy", "p")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    active, _, pcols, _ = dl._replay(path, None)
    assert pcols == ["p"]
    assert {rel.split("/")[0] for rel in active} == {"p=a", "p=b"}
    assert _rows(dl.read_delta(spark, path)) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_batch_reader_filter_pushdown_prunes_files(spark, tmp_path):
    """pushFilters → file pruning: a pushed comparison drops files whose
    stats/partitionValues provably cannot match, and the query result is
    still exact (Spark re-applies every filter row-level). Opt-in via
    option("filterPushdown") + the 4.1 session conf — the PLAIN reader
    must keep working on default-conf sessions where Spark refuses any
    reader that merely implements pushFilters."""
    from pyspark.sql.datasource import EqualTo

    from sustainable_building_energy_benchmarking_pipeline_spark.sources.delta_stream_source import (
        _PruningSnapshotReader,
    )

    path = str(tmp_path / "t")
    for lo in (0, 100, 200):  # three files with disjoint id ranges
        dl.write_delta(
            spark.createDataFrame(
                [(lo + i, 1.0) for i in range(10)], "id bigint, v double"
            ).coalesce(1),
            path,
        )
    r = _PruningSnapshotReader({"path": path}, dl._replay(path, None)[1])
    assert len(r.partitions()) == 3  # unfiltered: every file is a task
    leftover = list(r.pushFilters([EqualTo(("id",), 105)]))
    assert len(leftover) == 1  # every filter handed back to Spark
    assert len(r.partitions()) == 1  # stats pruning: one candidate file
    # partition-column pushdown prunes by partitionValues
    ppath = str(tmp_path / "p")
    dl.write_delta(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id bigint, p string, v double"
        ).repartition(2, "p"),
        ppath,
        partition_by=["p"],
    )
    pr = _PruningSnapshotReader({"path": ppath}, dl._replay(ppath, None)[1])
    list(pr.pushFilters([EqualTo(("p",), "b")]))
    parts = pr.partitions()
    assert len(parts) == 1 and parts[0].value["pvals"] == {"p": "b"}
    # end-to-end with conf + option on: exact result
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("deltalog")
            .option("filterPushdown", "true")
            .load(path)
            .filter("id >= 100 AND id < 110")
            .count()
        )
        assert got == 10
        assert [
            r2["id"]
            for r2 in spark.read.format("deltalog")
            .option("filterPushdown", "true")
            .load(ppath)
            .filter("p = 'b'")
            .collect()
        ] == [2]
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
    # default posture: plain reader, no pushFilters, default conf — works
    assert spark.read.format("deltalog").load(path).count() == 30


def test_batch_writer_row_tracking_table(spark, tmp_path):
    """The data source writer stamps fresh row ids into a rowTracking
    table (same re-stamp machinery as write_delta)."""
    import shutil as _sh

    src = os.path.join(DATA, "golden_delta_rowtracking")
    path = str(tmp_path / "rt")
    _sh.copytree(src, path)
    spark.createDataFrame([(6, 6.0)], "id bigint, v double").coalesce(
        1
    ).write.format("deltalog").mode("append").save(path)
    v = dl._list_versions(path)[-1]
    adds = [a["add"] for a in dl._read_actions(path, v) if "add" in a]
    assert adds[0]["baseRowId"] == 5  # fixture high-water mark is 4
    assert adds[0]["defaultRowCommitVersion"] == v
    assert dl._row_id_high_water_mark(path, v) == 5
    assert dl.read_delta(spark, path).count() == 6


def test_stream_writer_refuses_non_append_output_mode(spark, tmp_path):
    """ADVICE r9: commit() always appends, so a complete/update sink
    (Spark signals it via overwrite=True) would silently duplicate rows
    every micro-batch — the writer must refuse at construction."""
    import pytest
    from pyspark.sql.types import StructType

    from sustainable_building_energy_benchmarking_pipeline_spark.sources.delta_stream_source import (
        _DeltaStreamWriter,
    )

    path = str(tmp_path / "t")
    schema = StructType.fromDDL("id bigint, v double")
    with pytest.raises(ValueError, match="append"):
        _DeltaStreamWriter({"path": path}, schema, overwrite=True)


def test_batch_source_nested_column_mapping_values(spark):
    """Round-10: nested renames resolve at EVERY level — struct fields
    and array-of-struct element fields present logical names with nulls
    (null struct, null array, null leaf, empty array) preserved.
    Round-11: renames inside a MAP's value type rebuild too (the last
    refused nested-CM shape) — null map and empty map preserved."""
    path = os.path.join(DATA, "golden_delta_cm_nested")
    via = spark.read.format("deltalog").load(path)
    assert via.schema["s"].dataType.fieldNames() == ["a", "b"]
    assert via.schema["arr"].dataType.elementType.fieldNames() == ["c"]
    assert via.schema["m"].dataType.valueType.fieldNames() == ["d"]
    rows = {r["id"]: r.asDict(recursive=True) for r in via.collect()}
    assert rows[1]["s"] == {"a": 10, "b": "x"}
    assert [e["c"] for e in rows[1]["arr"]] == [1.5, 2.5]
    assert rows[1]["m"] == {"k1": {"d": 7}, "k2": {"d": 8}}
    assert rows[2]["s"] is None and rows[2]["arr"] is None
    assert rows[2]["m"] is None
    assert rows[3]["s"] == {"a": 30, "b": None} and rows[3]["arr"] == []
    assert rows[3]["m"] == {}
    # parity with the log-layer reader on the same fixture
    native = {
        r["id"]: r.asDict(recursive=True)
        for r in dl.read_delta(spark, path).collect()
    }
    assert rows == native


def test_stream_source_nested_column_mapping(spark, tmp_path):
    """The nested rebuild runs on the STREAMING path too (same executor
    kernel): the initial micro-batch must land the logical shape."""
    import shutil

    src = os.path.join(DATA, "golden_delta_cm_nested")
    path = str(tmp_path / "ncm")
    shutil.copytree(src, path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    native = dl.read_delta(spark, path)
    q = (
        spark.readStream.format("deltalog")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.schema(native.schema).parquet(out)
    def by_id(df):
        return {r["id"]: r.asDict(recursive=True) for r in df.collect()}
    assert by_id(got) == by_id(native)


def test_batch_writer_cdf_append_and_overwrite(spark, tmp_path):
    """Round-10: the data-source writer APPENDS into a CDF-enabled table
    cdc-free (add-only commits derive as inserts). Round-11: OVERWRITE
    lands too — the driver stages spec cdc actions + _change_data files
    with pyarrow (old rows → delete, new rows → insert), and
    table_changes' rendering matches the snapshot diff exactly."""
    import shutil

    path = str(tmp_path / "cdf")
    shutil.copytree(os.path.join(DATA, "golden_delta_cdf"), path)
    batch = spark.createDataFrame([(7, 7.0)], "id long, v double")
    batch.write.format("deltalog").mode("append").save(path)
    assert dl.read_delta(spark, path).count() == 4
    v = dl._list_versions(path)[-1]
    assert not any("cdc" in a for a in dl._read_actions(path, v))
    tc = dl.table_changes(spark, path, v - 1, v).collect()
    assert [(r["id"], r["_change_type"]) for r in tc] == [(7, "insert")]
    # overwrite: snapshot-diff oracle BEFORE the write
    old_rows = sorted(
        (r["id"], r["v"]) for r in dl.read_delta(spark, path).collect()
    )
    ow = spark.createDataFrame([(8, 8.0), (9, 9.0)], "id long, v double")
    ow.write.format("deltalog").mode("overwrite").save(path)
    assert sorted(
        r["id"] for r in dl.read_delta(spark, path).collect()
    ) == [8, 9]
    v2 = dl._list_versions(path)[-1]
    acts = dl._read_actions(path, v2)
    cdcs = [a["cdc"] for a in acts if "cdc" in a]
    assert cdcs and all(not c["dataChange"] for c in cdcs)
    assert all(c["path"].startswith("_change_data/") for c in cdcs)
    got = sorted(
        (r["id"], r["v"], r["_change_type"])
        for r in dl.table_changes(spark, path, v2 - 1, v2).collect()
    )
    want = sorted(
        [(i, x, "delete") for i, x in old_rows]
        + [(8, 8.0, "insert"), (9, 9.0, "insert")]
    )
    assert got == want


def test_batch_read_change_feed_matches_table_changes(spark, tmp_path):
    """Round-10: option('readChangeFeed','true') + startingVersion turns
    a batch read into the CDF surface — same rows as table_changes,
    including cdc-action exclusivity on the fixture's UPDATE commit."""
    import shutil

    path = str(tmp_path / "cdf")
    shutil.copytree(os.path.join(DATA, "golden_delta_cdf"), path)
    got = (
        spark.read.format("deltalog")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load(path)
    )
    assert got.columns[-3:] == [
        "_change_type", "_commit_version", "_commit_timestamp",
    ]
    want = dl.table_changes(spark, path, 0)

    def norm(df):
        return sorted(
            (
                r["id"], r["v"], r["_change_type"], r["_commit_version"],
                r["_commit_timestamp"],
            )
            for r in df.collect()
        )

    assert norm(got) == norm(want)
    # endingVersion bounds the window
    only1 = (
        spark.read.format("deltalog")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .option("endingVersion", 1)
        .load(path)
    )
    assert {r["_change_type"] for r in only1.collect()} == {
        "update_preimage", "update_postimage",
    }
    # startingVersion is required for batch CDF
    with pytest.raises(Exception, match="startingVersion"):
        spark.read.format("deltalog").option(
            "readChangeFeed", "true"
        ).load(path).collect()


def test_stream_read_change_feed(spark, tmp_path):
    """Streaming CDF: the replay batch renders history (cdc commits via
    their cdc files), and a mid-stream UPDATE lands as its
    preimage/postimage pair instead of raising the append-only error."""
    import shutil

    path = str(tmp_path / "cdf")
    shutil.copytree(os.path.join(DATA, "golden_delta_cdf"), path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    schema = "id long, v double, _change_type string, _commit_version long, _commit_timestamp timestamp"

    def _start():
        return (
            spark.readStream.format("deltalog")
            .option("readChangeFeed", "true")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = _start()
    q.processAllAvailable()
    q.stop()
    hist = {
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.read.schema(schema).parquet(out).collect()
    }
    assert (1, 1.0, "update_preimage", 1) in hist
    assert (1, 99.0, "update_postimage", 1) in hist
    assert (3, 3.0, "insert", 2) in hist
    v = dl.update_delta(spark, path, "id = 3", {"v": "v * 2"})
    q = _start()
    q.processAllAvailable()
    q.stop()
    now = {
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.read.schema(schema).parquet(out).collect()
    }
    assert (3, 3.0, "update_preimage", v) in now
    assert (3, 6.0, "update_postimage", v) in now


def test_batch_change_feed_derived_and_dv_refusal(spark, tmp_path):
    """Non-cdc commits derive: appends render as inserts, a rewrite
    DELETE as whole-file delete+insert (the honest file-granular form);
    an external DV re-add without cdc refuses toward table_changes."""
    path = str(tmp_path / "plain")
    dl.write_delta(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
        .coalesce(1),
        path,
    )
    dl.delete_delta(spark, path, "id = 1")
    got = sorted(
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.read.format("deltalog")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load(path)
        .collect()
    )
    assert got == [
        (1, 1.0, "delete", 1),
        (2, 2.0, "delete", 1),
        (2, 2.0, "insert", 1),
    ]
    # DV re-add of the same path without cdc → refuse, point at batch
    with pytest.raises(Exception, match="table_changes"):
        spark.read.format("deltalog").option(
            "readChangeFeed", "true"
        ).option("startingVersion", 1).load(
            os.path.join(DATA, "golden_delta_dv")
        ).collect()


def test_batch_source_variant_unannotated_reads(spark):
    """Round-12: variant tables whose files spell variant as the
    UNANNOTATED struct<value, metadata> group (external writers — the
    golden fixture) read through the registered source, matching
    read_delta value-for-value including null variants."""
    from pyspark.sql import functions as F

    path = os.path.join(DATA, "golden_delta_variant")
    want = sorted(
        (r["id"], r["j"])
        for r in dl.read_delta(spark, path)
        .select("id", F.to_json("v").alias("j"))
        .collect()
    )
    df = spark.read.format("deltalog").load(path)
    assert df.schema["v"].dataType.typeName() == "variant"
    got = sorted(
        (r["id"], r["j"])
        for r in df.select("id", F.to_json("v").alias("j")).collect()
    )
    assert got == want


def test_stream_source_variant_unannotated(spark, tmp_path):
    """The streaming form of the same read: availableNow over the
    variant fixture lands the decoded variants in a parquet sink."""
    from pyspark.sql import functions as F

    path = os.path.join(DATA, "golden_delta_variant")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    q = (
        spark.readStream.format("deltalog")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["id"], r["j"])
        for r in spark.read.parquet(out)
        .select("id", F.to_json("v").alias("j"))
        .collect()
    )
    want = sorted(
        (r["id"], r["j"])
        for r in dl.read_delta(spark, path)
        .select("id", F.to_json("v").alias("j"))
        .collect()
    )
    assert got == want


def test_batch_writer_variant_round_trip(spark, tmp_path):
    """Round-12: the data-source WRITER emits variant as the
    unannotated struct<value,metadata> spelling, declares variantType
    on both protocol sides at creation, and the same source reads the
    result back — a full variant round-trip without write_delta."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "v")
    vdf = spark.sql(
        "select id, parse_json(concat('{\"a\":', id, '}')) as v from range(3)"
    )
    vdf.write.format("deltalog").mode("append").save(path)
    proto = dl._latest_protocol(path, dl._list_versions(path)[-1])
    assert "variantType" in (proto.get("readerFeatures") or [])
    assert "variantType" in (proto.get("writerFeatures") or [])
    want = sorted(
        (r["id"], r["j"])
        for r in dl.read_delta(spark, path)
        .select("id", F.to_json("v").alias("j"))
        .collect()
    )
    assert want == [(0, '{"a":0}'), (1, '{"a":1}'), (2, '{"a":2}')]
    got = sorted(
        (r["id"], r["j"])
        for r in spark.read.format("deltalog")
        .load(path)
        .select("id", F.to_json("v").alias("j"))
        .collect()
    )
    assert got == want
    # appends into the existing variant table land too
    spark.sql(
        "select id + 10 as id, parse_json('{\"b\":true}') as v from range(2)"
    ).write.format("deltalog").mode("append").save(path)
    assert dl.read_delta(spark, path).count() == 5


def test_batch_writer_ntz_declares_feature(spark, tmp_path):
    """A new table with a TIMESTAMP_NTZ column created through the
    data-source writer declares timestampNtz on both protocol sides
    (round-12 — previously under-declared as (1,2))."""
    path = str(tmp_path / "ntz")
    spark.sql(
        "select id, timestamp_ntz '2024-01-01 00:00:00' as ts from range(2)"
    ).write.format("deltalog").mode("append").save(path)
    proto = dl._latest_protocol(path, 0)
    assert "timestampNtz" in (proto.get("readerFeatures") or [])
    got = dl.read_delta(spark, path).collect()
    assert len(got) == 2 and str(got[0]["ts"]) == "2024-01-01 00:00:00"


def test_batch_source_variant_annotated_refuses_with_pointer(spark, tmp_path):
    """Spark-WRITTEN variant files annotate the parquet group with the
    VARIANT logical type, which executor pyarrow cannot open — the
    planning probe refuses upfront with read_delta named as the
    working path, never an opaque mid-scan Thrift error."""
    path = str(tmp_path / "ann")
    vdf = spark.sql(
        "select id, parse_json(concat('{\"a\":', id, '}')) as v from range(3)"
    )
    dl.write_delta(vdf, path)
    with pytest.raises(Exception, match="read_delta"):
        spark.read.format("deltalog").load(path).collect()


def test_batch_source_collated_table(spark):
    """Collated tables flow through the registered source: pyarrow
    reads the plain UTF-8 bytes, the schema presents the collated
    StringType, and engine comparisons are collation-aware."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.read.format("deltalog").load(
        os.path.join(DATA, "golden_delta_collations")
    )
    assert df.schema["s"].dataType == T.StringType("UNICODE_CI")
    assert df.filter(F.col("s") == "apple").count() == 2


def test_batch_writer_collated_column_stats_withheld(spark, tmp_path):
    """The data-source writer upholds the same collations-preview duty
    as write_delta: adds never carry binary-order min/max for a
    collated column (review fix, round-11)."""
    import json

    from pyspark.sql import functions as F

    path = str(tmp_path / "dsw_coll")
    dl.write_delta(
        spark.createDataFrame(
            [(1, "Alpha"), (2, "alpha")], "id long, s string"
        ).select("id", F.collate("s", "UNICODE_CI").alias("s")),
        path,
    )
    back = dl.read_delta(spark, path)  # collated schema from the table
    back.write.format("deltalog").mode("append").save(path)
    v = dl._list_versions(path)[-1]
    adds = [a["add"] for a in dl._read_actions(path, v) if "add" in a]
    assert adds
    for a in adds:
        st = json.loads(a["stats"])
        assert "s" not in st["minValues"] and "s" not in st["maxValues"]
        assert "id" in st["minValues"]  # other columns keep stats


def test_batch_writer_plain_append_into_collated_table(spark, tmp_path):
    """A PLAIN-string frame appended into a collated table (bytes are
    identical — write_delta accepts the same) must land AND withhold
    binary min/max for the collated column: the skip set comes from the
    TABLE schema, not the frame's."""
    import json

    from pyspark.sql import functions as F

    path = str(tmp_path / "dsw_coll_plain")
    dl.write_delta(
        spark.createDataFrame(
            [(1, "Alpha")], "id long, s string"
        ).select("id", F.collate("s", "UNICODE_CI").alias("s")),
        path,
    )
    plain = spark.createDataFrame([(2, "ALPHA")], "id long, s string")
    plain.write.format("deltalog").mode("append").save(path)
    v = dl._list_versions(path)[-1]
    adds = [a["add"] for a in dl._read_actions(path, v) if "add" in a]
    assert adds
    for a in adds:
        st = json.loads(a["stats"])
        assert "s" not in st["minValues"]
    # and the combined table is collation-aware end to end
    back = dl.read_delta(spark, path)
    assert back.filter(F.col("s") == "alpha").count() == 2


# ---- round-11: startingTimestamp / endingTimestamp ---------------------


def test_batch_cdf_starting_timestamp_matches_version(spark, tmp_path):
    """Round-11: startingTimestamp resolves to the first commit whose
    monotonized clock is >= ts — same rows as the startingVersion form;
    endingTimestamp bounds the window via version_at_timestamp; the
    option conflicts and after-latest cases raise."""
    import shutil

    path = str(tmp_path / "cdf")
    shutil.copytree(os.path.join(DATA, "golden_delta_cdf"), path)
    versions = dl._list_versions(path)
    clocks = dl._adjusted_commit_timestamps(path, versions)

    def norm(df):
        return sorted(
            (r["id"], r["v"], r["_change_type"], r["_commit_version"])
            for r in df.collect()
        )

    by_version = (
        spark.read.format("deltalog")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load(path)
    )
    by_ts = (
        spark.read.format("deltalog")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", clocks[1])
        .load(path)
    )
    assert norm(by_ts) == norm(by_version)
    # endingTimestamp at version 1's clock keeps only version 1's changes
    only1 = (
        spark.read.format("deltalog")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", clocks[1])
        .option("endingTimestamp", clocks[1])
        .load(path)
    )
    assert {r["_commit_version"] for r in only1.collect()} == {1}
    with pytest.raises(Exception, match="not both"):
        spark.read.format("deltalog").option("readChangeFeed", "true").option(
            "startingVersion", 1
        ).option("startingTimestamp", clocks[1]).load(path).collect()
    with pytest.raises(Exception, match="after the latest"):
        spark.read.format("deltalog").option("readChangeFeed", "true").option(
            "startingTimestamp", clocks[versions[-1]] + 10_000
        ).load(path).collect()


def test_stream_starting_timestamp_initial_offset(spark, tmp_path):
    """Streaming startingTimestamp: the initial offset lands just below
    the first commit whose clock is >= ts (window starts AT it), and a
    pre-history ts replays from the first commit."""
    from sustainable_building_energy_benchmarking_pipeline_spark.sources.delta_stream_source import (
        _CommitStreamReader,
        _version_before_timestamp,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    dl.write_delta(df.coalesce(1), path)
    dl.write_delta(df.coalesce(1), path, mode="append")
    dl.write_delta(df.coalesce(1), path, mode="append")
    versions = dl._list_versions(path)
    clocks = dl._adjusted_commit_timestamps(path, versions)
    assert _version_before_timestamp(path, clocks[2]) == 1
    assert _version_before_timestamp(path, 0) == -1
    schema = dl.read_delta(spark, path).schema
    r = _CommitStreamReader(
        {"path": path, "startingtimestamp": str(clocks[1])}, schema
    )
    assert r.initialOffset() == {"version": 0}


def test_batch_timestamp_as_of(spark, tmp_path):
    """Round-11: option('timestampAsOf', ts) time-travels the batch read
    via the same commit clock as read_delta(timestamp_as_of=...); both
    as-of options together raise."""
    path = str(tmp_path / "t")
    dl.write_delta(spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1), path)
    dl.write_delta(spark.createDataFrame([(2, 2.0)], "id long, v double").coalesce(1), path, mode="append")
    versions = dl._list_versions(path)
    clocks = dl._adjusted_commit_timestamps(path, versions)
    got = (
        spark.read.format("deltalog")
        .option("timestampAsOf", clocks[0])
        .load(path)
        .collect()
    )
    assert [(r["id"], r["v"]) for r in got] == [(1, 1.0)]
    want = dl.read_delta(spark, path, timestamp_as_of=clocks[0]).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    with pytest.raises(Exception, match="not both"):
        spark.read.format("deltalog").option("versionAsOf", 0).option(
            "timestampAsOf", clocks[0]
        ).load(path).collect()
