"""Streaming changelog-tail source (sources/changelog.py): offset
semantics, checkpoint resume, truncated-tail safety, permissive mode.

The streaming twin of the reference's high-water-mark incremental pull
(reference batch/state.py + main.py look-back — operator F3): Structured
Streaming's offset log replaces the hand-rolled watermark store."""

from __future__ import annotations

import json
import os

import pytest

from batch_public_spark.sources.changelog import register_changelog_source

SCHEMA = "k bigint, v bigint, src string"


def _append(path, recs):
    with open(path, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def _run_once(spark, log, ckpt, out):
    df = (
        spark.readStream.format("kvchangelog")
        .schema(SCHEMA)
        .option("path", log)
        .load()
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_changelog_tail_is_incremental_across_restarts(spark, tmp_path):
    """Exactly-once tailing across restarts: run 1 consumes the initial
    records; run 2 (same checkpoint) consumes ONLY the appended suffix —
    including the record whose first half was a truncated tail during
    run 1 (bytes past the last newline are never consumed early)."""
    register_changelog_source(spark)
    log = str(tmp_path / "log.jsonl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _append(log, [{"k": i, "v": i * 10, "src": "a"} for i in range(10)])
    with open(log, "a") as f:
        f.write('{"k": 99, "v": ')  # half-written tail record
    got = _run_once(spark, log, ckpt, out)
    assert got.count() == 10
    assert got.agg({"v": "sum"}).collect()[0][0] == 450
    # finish the tail record, append five more, resume from checkpoint
    with open(log, "a") as f:
        f.write('990, "src": "c"}\n')
    _append(log, [{"k": i, "v": i * 10, "src": "c"} for i in range(10, 15)])
    got2 = _run_once(spark, log, ckpt, out)
    assert got2.count() == 16  # 10 + completed tail + 5 — nothing re-read
    rows = {r.k: (r.v, r.src) for r in got2.collect()}
    assert rows[99] == (990, "c")
    assert rows[14] == (140, "c")


def test_changelog_empty_and_noop_batches(spark, tmp_path):
    """An empty (or newline-less) log yields an empty batch at offset 0;
    a second run with nothing appended reads nothing."""
    register_changelog_source(spark)
    log = str(tmp_path / "log.jsonl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    open(log, "w").close()
    assert _run_once(spark, log, ckpt, out).count() == 0
    _append(log, [{"k": 1, "v": 5, "src": "a"}])
    assert _run_once(spark, log, ckpt, out).count() == 1
    assert _run_once(spark, log, ckpt, out).count() == 1


def test_changelog_permissive_skips_malformed(spark, tmp_path):
    """mode=permissive drops malformed COMPLETE lines (strict raises);
    missing fields are NULL; extra fields are ignored."""
    register_changelog_source(spark)
    log = str(tmp_path / "log.jsonl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    with open(log, "w") as f:
        f.write('{"k": 1, "v": 10, "src": "a", "extra": true}\n')
        f.write("this is not json\n")
        f.write("[1, 2, 3]\n")
        f.write('{"k": 2}\n')
    df = (
        spark.readStream.format("kvchangelog")
        .schema(SCHEMA)
        .option("path", log)
        .option("mode", "permissive")
        .load()
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.k: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2}
    assert rows[2].v is None and rows[2].src is None


def test_changelog_strict_raises_on_malformed(spark, tmp_path):
    register_changelog_source(spark)
    log = str(tmp_path / "log.jsonl")
    with open(log, "w") as f:
        f.write("not json\n")
    df = (
        spark.readStream.format("kvchangelog")
        .schema(SCHEMA)
        .option("path", log)
        .load()
    )
    q = (
        df.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_changelog_permissive_skips_type_mismatched_fields():
    """The permissive contract covers TYPE-mismatched records, not just
    syntactically malformed JSON: a valid JSON line whose field cannot
    cast to the declared scalar type ({"k": [1]} -> TypeError from
    int(), {"k": "x"} -> ValueError) is skipped, and boolean fields
    accept only JSON booleans (bool("false") would coerce any non-empty
    string to True). r11-ADVICE fix; unit-level, no SparkSession."""
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType
    from batch_public_spark.sources.changelog import _ChangelogStreamReader

    schema = StructType(
        [StructField("k", LongType()), StructField("flag", BooleanType())]
    )
    perm = _ChangelogStreamReader(schema, {"path": "/nonexistent", "mode": "permissive"})
    raw = b"\n".join(
        [
            b'{"k": 1, "flag": true}',
            b'{"k": [1], "flag": true}',     # TypeError from int()
            b'{"k": "x", "flag": true}',     # ValueError from int()
            b'{"k": 2, "flag": "false"}',    # non-bool JSON for boolean
            b'{"k": 3, "flag": null}',       # NULL passes through
            b'{"k": 4}',                     # missing field -> NULL
        ]
    )
    assert list(perm._parse(raw)) == [(1, True), (3, None), (4, None)]

    strict = _ChangelogStreamReader(schema, {"path": "/nonexistent"})
    assert list(strict._parse(b'{"k": 5, "flag": false}')) == [(5, False)]
    for bad in (b'{"k": [1]}', b'{"k": "x"}', b'{"k": 6, "flag": "false"}'):
        with pytest.raises((ValueError, TypeError)):
            list(strict._parse(bad))


def _run_once_segmented(spark, logdir, ckpt, out, mode=None):
    r = (
        spark.readStream.format("kvchangelog_segments")
        .schema(SCHEMA)
        .option("path", logdir)
    )
    if mode:
        r = r.option("mode", mode)
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_segmented_changelog_parallel_incremental_restart(spark, tmp_path):
    """The partitioned (executor-parallel) segmented reader: run 1
    consumes three segments; between runs one segment grows, one gains a
    truncated tail, and a brand-new segment appears — run 2 (same
    checkpoint) consumes ONLY the advanced byte ranges, per segment."""
    from batch_public_spark.sources.changelog import register_changelog_source

    logdir = tmp_path / "segs"
    logdir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    for s in range(3):
        _append(str(logdir / f"seg-{s}.jsonl"), [
            {"k": s * 100 + i, "v": i, "src": f"s{s}"} for i in range(5)
        ])
    register_changelog_source(spark)
    got = _run_once_segmented(spark, str(logdir), ckpt, out)
    assert got.count() == 15
    # segment 0 grows; segment 1 gains a HALF-WRITTEN tail (must not be
    # consumed); segment 3 is new
    _append(str(logdir / "seg-0.jsonl"), [{"k": 900, "v": 9, "src": "s0"}])
    with open(logdir / "seg-1.jsonl", "a") as f:
        f.write('{"k": 901, "v":')
    _append(str(logdir / "seg-3.jsonl"), [{"k": 300 + i, "v": i, "src": "s3"} for i in range(2)])
    got2 = _run_once_segmented(spark, str(logdir), ckpt, out)
    assert got2.count() == 15 + 1 + 2  # nothing re-read, tail not consumed
    ks = {r.k for r in got2.collect()}
    assert 900 in ks and 901 not in ks and {300, 301} <= ks
    # run 3: the tail record completes -> exactly one more row
    with open(logdir / "seg-1.jsonl", "a") as f:
        f.write(' 11, "src": "s1"}\n')
    got3 = _run_once_segmented(spark, str(logdir), ckpt, out)
    assert got3.count() == 19
    assert {r.v for r in got3.collect() if r.k == 901} == {11}


def test_segmented_changelog_plans_one_partition_per_advancing_segment():
    """partitions(start, end) unit contract: one byte-range partition per
    segment with new bytes, starting where the last offset stopped; new
    segments start at 0; quiescent segments plan nothing."""
    from pyspark.sql.types import LongType, StructField, StructType
    from batch_public_spark.sources.changelog import _SegmentedChangelogStreamReader

    schema = StructType([StructField("k", LongType())])
    rdr = _SegmentedChangelogStreamReader(schema, {"path": "/tmp/nowhere"})
    start = {"segs": {"a.jsonl": 100, "b.jsonl": 50}}
    end = {"segs": {"a.jsonl": 180, "b.jsonl": 50, "c.jsonl": 30}}
    parts = rdr.partitions(start, end)
    got = {(p.path.split("/")[-1], p.start, p.end) for p in parts}
    assert got == {("a.jsonl", 100, 180), ("c.jsonl", 0, 30)}
    # nothing advanced -> a single empty placeholder partition
    idle = rdr.partitions(end, end)
    assert len(idle) == 1 and idle[0].end == idle[0].start


def test_segmented_changelog_last_newline_frontier(tmp_path):
    """_last_newline_end: consumable frontier is just past the last
    newline, 0 for newline-less content, and exact across the backward
    chunk boundary (content larger than one 64 KiB scan chunk)."""
    from batch_public_spark.sources.changelog import _last_newline_end

    p = tmp_path / "seg.jsonl"
    p.write_bytes(b"")
    assert _last_newline_end(str(p)) == 0
    p.write_bytes(b'{"k": 1}')  # no newline yet
    assert _last_newline_end(str(p)) == 0
    p.write_bytes(b'{"k": 1}\n{"k": 2}\n{"k": 3')
    assert _last_newline_end(str(p)) == len(b'{"k": 1}\n{"k": 2}\n')
    big = b"x" * (1 << 17)  # 128 KiB of newline-less tail after one record
    p.write_bytes(b'{"k": 1}\n' + big)
    assert _last_newline_end(str(p)) == len(b'{"k": 1}\n')


def test_segmented_changelog_rejects_single_file_path(tmp_path):
    """r12-ADVICE fix #1: offsets key segments by basename and
    partitions() reconstructs join(path, basename), so a single-FILE
    path can never replay correctly — it must be rejected at reader
    construction, not at task read time."""
    from pyspark.sql.types import LongType, StructField, StructType
    from batch_public_spark.sources.changelog import _SegmentedChangelogStreamReader

    f = tmp_path / "log.jsonl"
    f.write_text('{"k": 1}\n')
    schema = StructType([StructField("k", LongType())])
    with pytest.raises(ValueError, match="DIRECTORY"):
        _SegmentedChangelogStreamReader(schema, {"path": str(f)})
    # a directory (even a not-yet-existing one) is fine
    _SegmentedChangelogStreamReader(schema, {"path": str(tmp_path)})
    _SegmentedChangelogStreamReader(schema, {"path": str(tmp_path / "later")})


def test_segmented_changelog_raises_on_frontier_regression():
    """r12-ADVICE fix #2: a committed offset past the current frontier
    (segment truncated or replaced) or a committed segment that vanished
    is DATA LOSS under the append-only contract — partitions() must
    raise, not silently skip the segment."""
    from pyspark.sql.types import LongType, StructField, StructType
    from batch_public_spark.sources.changelog import _SegmentedChangelogStreamReader

    schema = StructType([StructField("k", LongType())])
    rdr = _SegmentedChangelogStreamReader(schema, {"path": "/tmp/nowhere"})
    committed = {"segs": {"a.jsonl": 100, "b.jsonl": 50}}
    truncated = {"segs": {"a.jsonl": 40, "b.jsonl": 50}}
    with pytest.raises(RuntimeError, match="append-only"):
        rdr.partitions(committed, truncated)
    vanished = {"segs": {"b.jsonl": 50}}
    with pytest.raises(RuntimeError, match="append-only"):
        rdr.partitions(committed, vanished)
    # equal frontier (no advance) is quiescence, not regression
    idle = rdr.partitions(committed, committed)
    assert len(idle) == 1 and idle[0].end == idle[0].start
