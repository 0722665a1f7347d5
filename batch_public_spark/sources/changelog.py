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
partition-planning ``DataSourceStreamReader`` (one partition per log
segment, the same evolution kvscan.py documents for its batch scan); the
offset/replay contract — the part the reference had to hand-build — is
identical in both.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

_SCALAR_CASTS = {
    "string": str,
    "bigint": int,
    "int": int,
    "double": float,
    "boolean": bool,
}


class _ChangelogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("kvchangelog requires option 'path'")
        self._permissive = options.get("mode", "strict").lower() == "permissive"
        self._fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"pos": 0}

    @staticmethod
    def _cast(typ: str, value):
        # bool() would coerce any non-empty JSON string (including
        # "false") to True — boolean fields accept only JSON booleans.
        if typ == "boolean":
            if not isinstance(value, bool):
                raise ValueError(f"expected JSON boolean, got {value!r}")
            return value
        return _SCALAR_CASTS.get(typ, str)(value)

    def _parse(self, raw: bytes) -> Iterator[tuple]:
        for line in raw.split(b"\n"):
            if not line.strip():
                continue
            # The row tuple is built INSIDE the try so a type-mismatched
            # field (e.g. {"k": [1]} -> TypeError from int()) is skipped
            # in permissive mode, honoring the documented contract — not
            # just syntactically malformed JSON.
            try:
                rec = json.loads(line)
                if not isinstance(rec, dict):
                    raise ValueError("not an object")
                row = tuple(
                    None
                    if rec.get(name) is None
                    else self._cast(typ, rec[name])
                    for name, typ in self._fields
                )
            except (ValueError, TypeError):
                if self._permissive:
                    continue
                raise
            yield row

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


def register_changelog_source(spark) -> None:
    """Idempotent registration (mirrors kvscan.register_kv_source)."""
    spark.dataSource.register(ChangelogDataSource)
