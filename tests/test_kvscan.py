"""Custom Python Data Source (sources/kvscan.py): byte-range split
planning, line-ownership semantics, filter pushdown, permissive mode, and
the two-phase-commit writer."""

from __future__ import annotations

import json
from collections import defaultdict
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, StringContains

from batch_public_spark.sources.kvscan import (
    KVSnapshotReader,
    RangePartition,
    _plan_ranges,
    _read_lines,
    register_kv_source,
)


def _rows(reader, part):
    """Flatten the reader's Arrow RecordBatches back to row tuples."""
    out = []
    for batch in reader.read(part):
        out.extend(tuple(d.values()) for d in batch.to_pylist())
    return out


def _write_jsonl(path, records):
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def snapshot(tmp_path):
    recs = [
        {"event_id": i, "ts_us": 1_000_000 * i, "event_type": "click" if i % 2 else "view", "value": i / 4}
        for i in range(200)
    ]
    p = tmp_path / "snap.jsonl"
    _write_jsonl(p, recs)
    return str(p), recs


def test_every_line_read_exactly_once_across_ranges(snapshot):
    """Line-ownership rule: any split plan covers each record exactly once
    — including ranges that start mid-line and exactly at line starts."""
    path, recs = snapshot
    size = os.path.getsize(path)
    for n_ranges in (1, 2, 3, 7, 50):
        chunk = -(-size // n_ranges)
        seen = []
        start = 0
        while start < size:
            part = RangePartition(path, start, min(start + chunk, size))
            seen.extend(json.loads(x) for x in _read_lines(part))
            start += chunk
        assert seen == recs, f"n_ranges={n_ranges}"


def test_plan_ranges_targets_segment_count(tmp_path):
    files = []
    for i in range(3):
        p = tmp_path / f"f{i}.jsonl"
        _write_jsonl(p, [{"x": j} for j in range(100)])
        files.append(str(p))
    parts = _plan_ranges(files, 6)
    assert 3 <= len(parts) <= 9  # proportional, >= 1 per file
    # ranges tile each file exactly
    by_file = {}
    for p in parts:
        by_file.setdefault(p.path, []).append((p.start, p.end))
    for f, ranges in by_file.items():
        ranges.sort()
        assert ranges[0][0] == 0
        assert ranges[-1][1] == os.path.getsize(f)
        for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
            assert e1 == s2


def test_push_filters_consumed_and_evaluated(snapshot):
    path, recs = snapshot
    reader = KVSnapshotReader(
        schema=_schema(), options={"path": path, "segments": "1"}
    )
    unsupported = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("ts_us",), 100_000_000),
                EqualTo(("event_type",), "click"),
                StringContains(("event_type",), "cl"),  # not supported → returned
            ]
        )
    )
    assert len(unsupported) == 1 and isinstance(unsupported[0], StringContains)
    [part] = reader.partitions()
    rows = _rows(reader, part)
    exp = [r for r in recs if r["ts_us"] >= 100_000_000 and r["event_type"] == "click"]
    assert len(rows) == len(exp)
    assert all(r[2] == "click" and r[1] >= 100_000_000 for r in rows)


def test_permissive_mode_skips_malformed_strict_raises(tmp_path):
    p = tmp_path / "dirty.jsonl"
    with open(p, "w") as f:
        f.write('{"event_id": 1, "ts_us": 5, "event_type": "x", "value": 1.0}\n')
        f.write("NOT JSON AT ALL\n")
        f.write('[1, 2, 3]\n')  # JSON but not an object
        f.write('{"event_id": 2, "ts_us": 6, "event_type": "y", "value": 2.0}\n')
    strict = KVSnapshotReader(_schema(), {"path": str(p), "segments": "1"})
    with pytest.raises(ValueError):
        _rows(strict, strict.partitions()[0])
    perm = KVSnapshotReader(
        _schema(), {"path": str(p), "segments": "1", "mode": "permissive"}
    )
    rows = _rows(perm, perm.partitions()[0])
    assert [r[0] for r in rows] == [1, 2]
    # Drop accounting (r7 ADVICE): permissive-mode data loss is counted,
    # not silent — 2 malformed lines, first offender sampled.
    assert perm.dropped_parse == 2 and perm.dropped_type == 0
    assert perm._first_dropped is not None and "NOT JSON" in perm._first_dropped


def test_permissive_type_mismatch_counted_and_logged(tmp_path, caplog):
    import logging

    p = tmp_path / "typed.jsonl"
    with open(p, "w") as f:
        f.write('{"event_id": 1, "ts_us": 5, "event_type": "x", "value": 1.0}\n')
        f.write(
            '{"event_id": "oops", "ts_us": 6, "event_type": "y", "value": 2.0}\n'
        )
        f.write('{"event_id": 3, "ts_us": 7, "event_type": "z", "value": 3.0}\n')
    perm = KVSnapshotReader(
        _schema(), {"path": str(p), "segments": "1", "mode": "permissive"}
    )
    with caplog.at_level(logging.WARNING, "batch_public_spark.sources.kvscan"):
        rows = _rows(perm, perm.partitions()[0])
    assert [r[0] for r in rows] == [1, 3]
    assert perm.dropped_type == 1 and perm.dropped_parse == 0
    assert any(
        "dropped 1 record" in m and "schema-type mismatch" in m
        for m in caplog.messages
    )


def test_empty_snapshot_reads_empty(tmp_path):
    p = tmp_path / "empty.jsonl"
    p.touch()
    reader = KVSnapshotReader(_schema(), {"path": str(p), "segments": "4"})
    parts = reader.partitions()
    assert len(parts) >= 1
    assert [r for part in parts for r in _rows(reader, part)] == []


def _schema():
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )


def test_spark_roundtrip_and_overwrite(spark, tmp_path):
    register_kv_source(spark)
    out = str(tmp_path / "snap")
    df = spark.range(50).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 1000).alias("ts_us"),
        F.lit("view").alias("event_type"),
        (F.col("id") / 8).alias("value"),
    )
    df.write.format("kvsnapshot").mode("overwrite").option("path", out).save()
    first_parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert first_parts
    back = spark.read.format("kvsnapshot").option("path", out).option("segments", 3).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # overwrite retires the previous generation completely
    df2 = df.filter(F.col("event_id") < 10)
    df2.write.format("kvsnapshot").mode("overwrite").option("path", out).save()
    back2 = spark.read.format("kvsnapshot").option("path", out).load()
    assert back2.count() == 10


def test_spark_filter_fully_pushed(spark, tmp_path):
    """With all predicates consumed by pushFilters, the physical plan has
    no post-scan Filter node — the source IS the filter."""
    register_kv_source(spark)
    out = str(tmp_path / "snap")
    spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 1000).alias("ts_us"),
        F.lit("view").alias("event_type"),
        (F.col("id") / 8).alias("value"),
    ).write.format("kvsnapshot").mode("overwrite").option("path", out).save()
    q = (
        spark.read.format("kvsnapshot")
        .option("path", out)
        .load()
        .filter((F.col("ts_us") >= 50_000) & (F.col("event_type") == "view"))
    )
    assert q.count() == 50
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"\(\d+\) Filter\b", plan) is None, plan


def test_append_preserves_previous_generation(spark, tmp_path):
    """Append-mode commits must never clobber earlier parts (committed
    names carry a per-write token; the r4 review's clobber scenario)."""
    register_kv_source(spark)
    out = str(tmp_path / "snap")
    df = spark.range(50).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 1000).alias("ts_us"),
        F.lit("view").alias("event_type"),
        (F.col("id") / 8).alias("value"),
    )
    df.repartition(4).write.format("kvsnapshot").mode("overwrite").option(
        "path", out
    ).save()
    df.filter(F.col("event_id") < 10).write.format("kvsnapshot").mode(
        "append"
    ).option("path", out).save()
    back = spark.read.format("kvsnapshot").option("path", out).load()
    assert back.count() == 60


# ---------------------------------------------------------------------------
# Property tests: split planning and line ownership under arbitrary shapes
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    line_lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    n_ranges=st.integers(min_value=1, max_value=12),
)
def test_line_ownership_exactly_once_property(tmp_path_factory, line_lengths, n_ranges):
    """For ANY file of lines (including empty lines) and ANY equal-chunk
    range plan, every line is read exactly once and in order."""
    tmp = tmp_path_factory.mktemp("kv")
    path = str(tmp / "f.jsonl")
    lines = ["x" * n for n in line_lengths]
    with open(path, "w") as f:
        for ln in lines:
            f.write(ln + "\n")
    size = os.path.getsize(path)
    chunk = max(1, -(-size // n_ranges))
    seen = []
    start = 0
    while start < size:
        part = RangePartition(path, start, min(start + chunk, size))
        seen.extend(x.rstrip(b"\n").decode() for x in _read_lines(part))
        start += chunk
    # blank lines are skipped by read() but _read_lines yields them raw
    assert seen == lines


@settings(max_examples=60, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=6),
    segments=st.integers(min_value=1, max_value=20),
)
def test_plan_ranges_tiles_exactly_property(tmp_path_factory, sizes, segments):
    """For ANY set of file sizes and ANY segment target: ranges tile each
    non-empty file exactly (no gap, no overlap, full coverage), and empty
    files contribute no ranges."""
    tmp = tmp_path_factory.mktemp("kv")
    files = []
    for i, n in enumerate(sizes):
        p = str(tmp / f"f{i}")
        with open(p, "wb") as f:
            f.write(b"a" * n)
        files.append(p)
    parts = _plan_ranges(files, segments)
    if sum(sizes) == 0:
        # all-empty snapshot → one (0,0) placeholder so planning still
        # yields >= 1 partition (empty DataFrame, not a planning error)
        assert [(p.start, p.end) for p in parts] == [(0, 0)]
        return
    by_file = defaultdict(list)
    for p in parts:
        by_file[p.path].append((p.start, p.end))
    for f, n in zip(files, sizes):
        ranges = sorted(by_file.get(f, []))
        if n == 0:
            assert ranges == []
            continue
        assert ranges[0][0] == 0 and ranges[-1][1] == n
        for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
            assert e1 == s2
            assert e2 > s2


def test_stream_reader_incremental_with_checkpoint(spark, tmp_path):
    """readStream over kvsnapshot: first run ingests the snapshot, a later
    run with the SAME checkpoint ingests only the appended generation —
    the file-name offset is the engine-checkpointed high-water mark."""
    register_kv_source(spark)
    snap, ckpt, out = (
        str(tmp_path / "snap"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    df = spark.range(30).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 1000).alias("ts_us"),
        F.lit("view").alias("event_type"),
        (F.col("id") / 4).alias("value"),
    )
    df.write.format("kvsnapshot").mode("overwrite").option("path", snap).save()

    def run_once():
        s = spark.readStream.format("kvsnapshot").option("path", snap).load()
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        return spark.read.parquet(out).count()

    assert run_once() == 30
    df.filter(F.col("event_id") < 5).write.format("kvsnapshot").mode("append").option(
        "path", snap
    ).save()
    assert run_once() == 35  # only the 5 appended rows ingested


def test_stream_reader_offsets_replayable():
    """readBetweenOffsets must re-read exactly the files between two
    offsets (exactly-once replay after a failed batch)."""
    import tempfile

    d = tempfile.mkdtemp()
    for i, n in enumerate((3, 4)):
        _write_jsonl(
            os.path.join(d, f"part-x-{i:05d}.jsonl"),
            [{"event_id": i * 10 + j, "ts_us": j, "event_type": "v", "value": 0.0} for j in range(n)],
        )
    r = __import__(
        "batch_public_spark.sources.kvscan", fromlist=["KVSnapshotStreamReader"]
    ).KVSnapshotStreamReader(_schema(), {"path": d})
    start = r.initialOffset()
    rows, end = r.read(start)
    assert len(list(rows)) == 7
    assert end["seen"] == ["part-x-00000.jsonl", "part-x-00001.jsonl"]
    # replay only the second file's delta
    mid = {"seen": ["part-x-00000.jsonl"]}
    assert len(r.readBetweenOffsets(mid, end)) == 4
    # nothing new → empty batch, offset unchanged
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == end


def test_permissive_counters_reset_per_partition(tmp_path, caplog):
    """r8 ADVICE: one deserialized reader instance can serve several
    partitions — drop counters must reset at read() entry so each
    partition's warning reports ITS drops, not a running total."""
    import logging

    p = tmp_path / "dirty2.jsonl"
    lines = [
        '{"event_id": 1, "ts_us": 5, "event_type": "x", "value": 1.0}\n',
        "BROKEN ONE\n",
        '{"event_id": 2, "ts_us": 6, "event_type": "y", "value": 2.0}\n',
        "BROKEN TWO\n",
    ]
    with open(p, "w") as f:
        f.writelines(lines)
    size = p.stat().st_size
    half = len(lines[0]) + len(lines[1])  # split exactly between rows 2 and 3
    perm = KVSnapshotReader(
        _schema(), {"path": str(p), "segments": "2", "mode": "permissive"}
    )
    parts = [
        RangePartition(str(p), 0, half),
        RangePartition(str(p), half, size),
    ]
    with caplog.at_level(logging.WARNING):
        assert [r[0] for r in _rows(perm, parts[0])] == [1]
        first_counts = (perm.dropped_parse, perm.dropped_type)
        assert [r[0] for r in _rows(perm, parts[1])] == [2]
        second_counts = (perm.dropped_parse, perm.dropped_type)
    # each partition saw exactly ONE malformed line — no accumulation
    assert first_counts == (1, 0)
    assert second_counts == (1, 0)
    assert perm._first_dropped is not None and "BROKEN TWO" in perm._first_dropped
    warnings = [r.getMessage() for r in caplog.records if "dropped" in str(r.msg)]
    assert len(warnings) == 2
    assert all("dropped 1 record" in w for w in warnings), warnings
