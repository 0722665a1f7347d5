"""Changelog-tail STREAMING data source (Spark 4 Python Data Source API).

The reference pulls incrementally: every run filters the KV scan by a
persisted high-water mark (reference ``batch/state.py`` watermark store +
``main.py`` look-back filter — operator F3). The batch re-expression of
that contract lives in ``pipeline/state.py``/``orchestrator.py``; THIS
module is its **streaming twin**: a ``readStream`` source that tails an
append-only JSONL changelog by BYTE OFFSET, so the "where did the last
run stop" bookkeeping the reference hand-rolls becomes Spark Structured
Streaming's own offset/checkpoint machinery (exactly-once per micro-batch,
replayable between offsets, resumable across restarts from the checkpoint
directory — no bespoke watermark table needed).

Registered as ``spark.readStream.format("kvchangelog")`` via
:func:`register_changelog_source`. Options:

* ``path`` (required) — one append-only JSONL file.
* ``mode`` — ``strict`` (default: malformed JSON raises) or
  ``permissive`` (malformed/truncated lines are skipped; a line is only
  consumed once a newline terminates it, so a half-written tail record is
  left for the next batch in BOTH modes).

The user supplies the schema (``.schema(...)``); top-level JSON fields are
matched by name, missing fields are NULL, and only flat scalar types
(string/bigint/int/double/boolean) are supported — the same contract as
the kvsnapshot batch source (sources/kvscan.py).

Offsets are ``{"pos": <byte offset>}``. ``read(start)`` consumes from
``start.pos`` to the last newline currently in the file;
``readBetweenOffsets`` re-reads exactly ``[start.pos, end.pos)`` for
micro-batch replay after a failure — byte ranges make replay exact with
no per-record bookkeeping.

100 TB notes: ``SimpleDataSourceStreamReader`` reads on the driver with
prefetch — correct for a single-file changelog tail (the shape here: a
control-plane feed, not the corpus). The corpus-scale path is the
partition-planning ``DataSourceStreamReader`` over a SEGMENTED log
directory — implemented below as ``format("kvchangelog_segments")``
(:class:`_SegmentedChangelogStreamReader`): per-segment byte frontiers as
the offset, one executor-read partition per advancing segment, the same
offset/replay contract — the part the reference had to hand-build —
in both.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, List, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCALAR_CASTS = {
    "string": str,
    "bigint": int,
    "int": int,
    "double": float,
    "boolean": bool,
}


def _cast_scalar(typ: str, value):
    # bool() would coerce any non-empty JSON string (including
    # "false") to True — boolean fields accept only JSON booleans.
    if typ == "boolean":
        if not isinstance(value, bool):
            raise ValueError(f"expected JSON boolean, got {value!r}")
        return value
    return _SCALAR_CASTS.get(typ, str)(value)


def _parse_jsonl(
    raw: bytes, fields: Sequence[Tuple[str, str]], permissive: bool
) -> Iterator[tuple]:
    """Shared record contract for both changelog readers (driver-tail and
    segmented-partitioned): flat scalar fields matched by name, missing
    fields NULL. The row tuple is built INSIDE the try so a
    type-mismatched field (e.g. {"k": [1]} -> TypeError from int()) is
    skipped in permissive mode, honoring the documented contract — not
    just syntactically malformed JSON."""
    for line in raw.split(b"\n"):
        if not line.strip():
            continue
        try:
            rec = json.loads(line)
            if not isinstance(rec, dict):
                raise ValueError("not an object")
            row = tuple(
                None if rec.get(name) is None else _cast_scalar(typ, rec[name])
                for name, typ in fields
            )
        except (ValueError, TypeError):
            if permissive:
                continue
            raise
        yield row


class _ChangelogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("kvchangelog requires option 'path'")
        self._permissive = options.get("mode", "strict").lower() == "permissive"
        self._fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _parse(self, raw: bytes) -> Iterator[tuple]:
        return _parse_jsonl(raw, self._fields, self._permissive)

    def _consumable(self, start_pos: int) -> Tuple[bytes, int]:
        """Bytes from start_pos to the LAST newline currently present —
        a half-written tail record is never consumed (its bytes stay
        beyond the reported offset for the next batch)."""
        if not os.path.exists(self._path):
            return b"", start_pos
        with open(self._path, "rb") as f:
            f.seek(start_pos)
            raw = f.read()
        cut = raw.rfind(b"\n")
        if cut < 0:
            return b"", start_pos
        return raw[: cut + 1], start_pos + cut + 1

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        raw, end_pos = self._consumable(int(start["pos"]))
        # iter(list(...)), not a bare generator or list: the prefetch
        # cache pickles what read() returns (generators aren't picklable)
        # and calls next() on it when offsets don't advance (lists aren't
        # iterators) — a list_iterator satisfies both
        return iter(list(self._parse(raw))), {"pos": end_pos}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        s, e = int(start["pos"]), int(end["pos"])
        if e <= s or not os.path.exists(self._path):
            return iter([])
        with open(self._path, "rb") as f:
            f.seek(s)
            raw = f.read(e - s)
        return iter(list(self._parse(raw)))


class ChangelogDataSource(DataSource):
    """``format("kvchangelog")`` — append-only JSONL changelog tail."""

    @classmethod
    def name(cls) -> str:
        return "kvchangelog"

    def schema(self) -> str:
        # Default shape of the fixture changelog; callers normally pass
        # their own flat scalar schema.
        return "k bigint, v bigint, src string"

    def simpleStreamReader(self, schema: StructType) -> _ChangelogStreamReader:
        return _ChangelogStreamReader(schema, self.options)


@dataclass
class SegmentRange(InputPartition):
    path: str
    start: int
    end: int


def _segment_files(path: str) -> List[str]:
    # Directory-only contract (enforced at reader construction): offsets
    # key segments by basename, so a bare-file path could not round-trip
    # through partitions() anyway.
    if not os.path.isdir(path):
        return []
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith(("_", ".")):
            continue
        full = os.path.join(path, name)
        if os.path.isfile(full):
            out.append(full)
    return out


def _last_newline_end(path: str) -> int:
    """Byte offset just past the LAST newline in the file — the consumable
    frontier (a half-written tail record is never consumed; same contract
    as the single-file tail reader). Scans backwards in bounded chunks so
    a multi-GB segment costs one tail read, not a full scan."""
    size = os.path.getsize(path)
    chunk = 1 << 16
    with open(path, "rb") as f:
        hi = size
        while hi > 0:
            lo = max(0, hi - chunk)
            f.seek(lo)
            buf = f.read(hi - lo)
            cut = buf.rfind(b"\n")
            if cut >= 0:
                return lo + cut + 1
            hi = lo
    return 0


class _SegmentedChangelogStreamReader(DataSourceStreamReader):
    """Partition-planning streaming reader over a DIRECTORY of append-only
    JSONL segment files — the corpus-scale evolution the single-file tail
    reader's module docstring documents (and the streaming face of the
    kvscan segment idiom): offsets are per-segment byte frontiers
    ``{"segs": {basename: pos}}``, and ``partitions(start, end)`` plans
    ONE input partition per segment with new bytes, so a micro-batch
    reads every advancing segment in parallel on executors (the Simple
    reader funnels all bytes through the driver). Replay is exact: a
    partition is a frozen ``[start, end)`` byte range of one segment,
    re-read verbatim on task retry — the same contract, now
    segment-granular. Segments are append-only; new segment files join
    the frontier at offset 0; frontiers only advance past complete
    (newline-terminated) records in BOTH modes."""

    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("kvchangelog_segments requires option 'path'")
        # Offsets key segments by basename and partitions() reconstructs
        # os.path.join(path, basename); a single-FILE path would plan
        # '<file>/<basename>' and fail only at task read time, so reject
        # it up front (the single-file case is the plain "kvchangelog"
        # tail reader's job).
        if os.path.isfile(self._path):
            raise ValueError(
                "kvchangelog_segments expects a DIRECTORY of append-only "
                f"segment files, got a file: {self._path!r}; use "
                "format('kvchangelog') for a single-file tail"
            )
        self._permissive = options.get("mode", "strict").lower() == "permissive"
        self._fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"segs": {}}

    def latestOffset(self) -> dict:
        return {
            "segs": {
                os.path.basename(p): _last_newline_end(p)
                for p in _segment_files(self._path)
            }
        }

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        seen = start.get("segs", {})
        frontier = end.get("segs", {})
        # Append-only contract: a committed segment must still exist and
        # its frontier must not have moved backwards. A truncated,
        # replaced, or deleted segment is DATA LOSS — surface it instead
        # of silently replanning around it (the record-level analogue is
        # strict-mode parse failure).
        regressed = {
            name: (int(pos), frontier.get(name))
            for name, pos in seen.items()
            if name not in frontier or int(frontier[name]) < int(pos)
        }
        if regressed:
            raise RuntimeError(
                "kvchangelog_segments: append-only contract violated — "
                "committed offsets exceed the current frontier (segment "
                f"truncated/replaced/deleted): {regressed}"
            )
        parts = [
            SegmentRange(os.path.join(self._path, name), int(seen.get(name, 0)), int(pos))
            for name, pos in sorted(frontier.items())
            if int(pos) > int(seen.get(name, 0))
        ]
        # Spark requires >= 1 partition per batch even when no segment
        # advanced (e.g. the availableNow final empty batch).
        return parts or [SegmentRange(path="", start=0, end=0)]

    def read(self, partition: SegmentRange) -> Iterator[tuple]:
        if not partition.path or partition.end <= partition.start:
            return iter([])
        with open(partition.path, "rb") as f:
            f.seek(partition.start)
            raw = f.read(partition.end - partition.start)
        return _parse_jsonl(raw, self._fields, self._permissive)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine checkpoint; nothing to release


class ChangelogSegmentedDataSource(DataSource):
    """``readStream.format("kvchangelog_segments")`` — executor-parallel
    tail over a directory of append-only JSONL segments."""

    @classmethod
    def name(cls) -> str:
        return "kvchangelog_segments"

    def schema(self) -> str:
        return "k bigint, v bigint, src string"

    def streamReader(self, schema: StructType) -> _SegmentedChangelogStreamReader:
        return _SegmentedChangelogStreamReader(schema, self.options)


def register_changelog_source(spark) -> None:
    """Idempotent registration (mirrors kvscan.register_kv_source)."""
    spark.dataSource.register(ChangelogDataSource)
    spark.dataSource.register(ChangelogSegmentedDataSource)
