"""Segmented KV-snapshot data source (Spark 4 Python Data Source API).

The reference's primary source is a paginated key-value table scan
(reference ``batch/dynamo_fetcher.py:282-291`` — a sequential
``table.scan`` loop following ``ExclusiveStartKey`` pages). Its
Spark-native re-expression is a *custom data source* whose scan is
**parallel by construction**: the snapshot is split into byte-range
partitions (DynamoDB's own scale story for this is ``Scan`` with
``Segment``/``TotalSegments`` — one segment per Spark task), and the
reference's client-side temporal filter (main.py look-back window) becomes
**filter pushdown** evaluated inside the source instead of a post-scan
Spark filter.

Registered as ``spark.read.format("kvsnapshot")`` via
:func:`register_kv_source`. Reads a directory (or single file) of JSONL
records with a flat scalar schema; supports:

* ``segments`` option — target number of byte-range input partitions
  (line-aligned splits, Hadoop LineRecordReader semantics: a line belongs
  to the split containing the byte before its first byte).
* Filter pushdown for ``=``, ``<``, ``<=``, ``>``, ``>=``, ``IS (NOT)
  NULL`` on top-level columns — consumed filters are fully evaluated in
  ``read()`` so Spark can drop them from the plan.
* ``mode=strict`` (default: malformed JSON raises) or ``mode=permissive``
  (malformed lines are skipped — the reference tolerates dirty records the
  same way in its JSONL parse half, batch_parse/parser.py).
* A task-commit writer: tasks emit temp files, the driver commit renames
  them into place (and in ``overwrite`` mode retires prior parts) — the
  standard two-phase sink protocol. Local/POSIX filesystem only, same
  caveat as sources.maintenance.compact_parquet.

100 TB notes: byte-range splitting is what makes a text snapshot
scan-parallel without a pre-shuffle; pushdown keeps the look-back filter
from materializing cold pages into Spark rows. For a *real* remote KV
store the partition planner would emit one partition per store segment
instead of byte ranges — ``partitions()`` is the single place that
changes.
"""

from __future__ import annotations

import json
import logging
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
import pyarrow as pa

from pyspark.sql.pandas.types import to_arrow_schema
from pyspark.sql.types import StructType

DEFAULT_SCHEMA_DDL = "event_id BIGINT, ts_us BIGINT, event_type STRING, value DOUBLE"


@dataclass
class RangePartition(InputPartition):
    path: str
    start: int
    end: int


@dataclass
class KVCommitMessage(WriterCommitMessage):
    tmp_path: str


def _data_files(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith(("_", ".")):
            continue
        full = os.path.join(path, name)
        if os.path.isfile(full):
            out.append(full)
    return out


def _plan_ranges(files: Sequence[str], segments: int) -> List[RangePartition]:
    sizes = {f: os.path.getsize(f) for f in files}
    total = sum(sizes.values())
    if total == 0:
        return [RangePartition(f, 0, 0) for f in files[:1]] or []
    chunk = max(1, -(-total // segments))  # ceil division
    parts: List[RangePartition] = []
    for f in files:
        size = sizes[f]
        if size == 0:
            continue
        start = 0
        while start < size:
            parts.append(RangePartition(f, start, min(start + chunk, size)))
            start += chunk
    return parts


def _read_lines(part: RangePartition) -> Iterator[bytes]:
    """Line-aligned byte-range read: a line belongs to the partition that
    contains the byte immediately preceding its first byte (the first line
    of the file belongs to the partition with start == 0)."""
    with open(part.path, "rb") as f:
        if part.start > 0:
            f.seek(part.start - 1)
            f.readline()  # remainder of a line owned by the previous range
        while f.tell() < part.end:
            line = f.readline()
            if not line:
                break
            yield line


_SUPPORTED_FILTERS = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    IsNull,
    IsNotNull,
)


def _passes(flt: Filter, rec: dict) -> bool:
    col = flt.attribute[0]
    v = rec.get(col)
    if isinstance(flt, IsNull):
        return v is None
    if isinstance(flt, IsNotNull):
        return v is not None
    if v is None:
        return False  # comparisons with NULL are never true
    if isinstance(flt, EqualTo):
        return v == flt.value
    if isinstance(flt, GreaterThan):
        return v > flt.value
    if isinstance(flt, GreaterThanOrEqual):
        return v >= flt.value
    if isinstance(flt, LessThan):
        return v < flt.value
    if isinstance(flt, LessThanOrEqual):
        return v <= flt.value  # pragma: no cover - exhaustive above
    raise AssertionError(f"unsupported filter leaked through pushFilters: {flt}")


_LOG = logging.getLogger(__name__)


class KVSnapshotReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        # Permissive-mode drop accounting (r7 ADVICE): data loss must be
        # observable. Counters accumulate per task and are flushed as ONE
        # warning line per partition at end-of-read — Spark's PERMISSIVE
        # JSON mode surfaces offenders via _corrupt_record; a custom scalar
        # source can't add a column the user didn't declare, so the
        # executor log line (count + first offending sample, truncated) is
        # the diagnosable channel.
        self.dropped_parse = 0
        self.dropped_type = 0
        self._first_dropped: str | None = None
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvsnapshot requires option 'path'")
        self.segments = int(options.get("segments", 8))
        if self.segments < 1:
            raise ValueError("segments must be >= 1")
        self.permissive = options.get("mode", "strict").lower() == "permissive"
        self.fields = [f.name for f in schema.fields]
        self.spark_schema = schema
        self.arrow_batch_size = int(options.get("arrow_batch_size", 4096))
        if self.arrow_batch_size < 1:
            raise ValueError("arrow_batch_size must be >= 1")
        self.pushed: List[Filter] = []

    def pushFilters(self, filters: List[Filter]):  # noqa: N802 (API name)
        for flt in filters:
            if isinstance(flt, _SUPPORTED_FILTERS) and len(flt.attribute) == 1:
                self.pushed.append(flt)  # fully evaluated in read()
            else:
                yield flt  # Spark keeps evaluating it post-scan

    def partitions(self) -> Sequence[InputPartition]:
        parts = _plan_ranges(_data_files(self.path), self.segments)
        # Always at least one (possibly empty) partition so empty snapshots
        # still produce an empty DataFrame instead of a planning error.
        return parts or [RangePartition(path="", start=0, end=0)]

    def read(self, partition: RangePartition) -> Iterator["pa.RecordBatch"]:
        """Yield ``pyarrow.RecordBatch`` chunks instead of per-row tuples.

        The Python Data Source API accepts either; Arrow batches skip the
        per-row pickle round-trip between the Python worker and the JVM
        (one columnar buffer per ~``arrow_batch_size`` rows instead of one
        serialized tuple per record) — the same reason mapInArrow beats
        row UDFs. Parsing and pushed-filter evaluation stay per-record
        (they are dict-shaped by nature); only the transport is columnar.
        """
        if not partition.path:
            return
        # Per-partition counters: one deserialized reader instance may
        # serve several partitions, so reset at entry or the flushed
        # warning would report CUMULATIVE drops labeled with the last
        # partition's byte range.
        self.dropped_parse = 0
        self.dropped_type = 0
        self._first_dropped = None
        arrow_schema = to_arrow_schema(self.spark_schema)
        batch: List[dict] = []
        for raw in _read_lines(partition):
            raw = raw.strip()
            if not raw:
                continue
            try:
                rec = json.loads(raw)
                if not isinstance(rec, dict):
                    raise ValueError("record is not a JSON object")
            except ValueError:
                if self.permissive:
                    self.dropped_parse += 1
                    if self._first_dropped is None:
                        sample = raw[:200]
                        self._first_dropped = (
                            sample.decode("utf-8", "replace")
                            if isinstance(sample, bytes)
                            else sample
                        )
                    continue
                raise
            if all(_passes(flt, rec) for flt in self.pushed):
                batch.append({name: rec.get(name) for name in self.fields})
                if len(batch) >= self.arrow_batch_size:
                    yield from self._to_arrow(batch, arrow_schema)
                    batch = []
        if batch:
            yield from self._to_arrow(batch, arrow_schema)
        if self.dropped_parse or self.dropped_type:
            _LOG.warning(
                "kvsnapshot permissive mode dropped %d record(s) in %s "
                "[bytes %d-%d]: %d malformed JSON, %d schema-type mismatch; "
                "first offender: %r",
                self.dropped_parse + self.dropped_type,
                partition.path,
                partition.start,
                partition.end,
                self.dropped_parse,
                self.dropped_type,
                self._first_dropped,
            )

    def _to_arrow(
        self, batch: List[dict], arrow_schema: "pa.Schema"
    ) -> Iterator["pa.RecordBatch"]:
        """Convert a buffered batch to one RecordBatch.

        Permissive mode covers type mismatches too, not just parse errors:
        a well-formed JSON record whose field type defies the schema (e.g.
        a string in a BIGINT column) raises ``pa.ArrowInvalid`` /
        ``pa.ArrowTypeError`` at batch construction — without this fallback
        one bad record would fail the whole buffered batch of up to
        ``arrow_batch_size`` otherwise-good rows. On failure we retry
        per-record and drop only the offenders."""
        try:
            yield pa.RecordBatch.from_pylist(batch, schema=arrow_schema)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            if not self.permissive:
                raise
            good: List[dict] = []
            for rec in batch:
                try:
                    pa.RecordBatch.from_pylist([rec], schema=arrow_schema)
                    good.append(rec)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    self.dropped_type += 1
                    if self._first_dropped is None:
                        self._first_dropped = repr(rec)[:200]
                    continue
            if good:
                yield pa.RecordBatch.from_pylist(good, schema=arrow_schema)


class KVSnapshotWriter(DataSourceArrowWriter):
    """Arrow-batch task writer: each task receives ``pyarrow.RecordBatch``
    chunks (no per-row pickle between JVM and Python worker; columnar
    transfer like the reader). Encoding stays ``json.dumps`` over
    ``to_pylist`` rows — pandas ``to_json`` would be faster still but
    truncates doubles (default 10-digit precision), and the snapshot
    round-trip is hashed for double/long fidelity."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvsnapshot requires option 'path'")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # Per-write token: committed part names are unique across writes,
        # so append mode can never clobber a previous generation's parts.
        self.token = uuid.uuid4().hex[:12]

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> KVCommitMessage:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        with open(tmp, "w", encoding="utf-8") as f:
            for batch in iterator:
                f.writelines(
                    json.dumps(rec, ensure_ascii=False) + "\n"
                    for rec in batch.to_pylist()
                )
        return KVCommitMessage(tmp_path=tmp)

    def commit(self, messages) -> None:
        # Two-phase commit: all tasks succeeded; retire old parts (overwrite
        # mode) then promote temp files. Promotion is rename-only, so a
        # failure before this point leaves prior data untouched.
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") and name.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, name))
        for i, msg in enumerate(messages):
            os.replace(
                msg.tmp_path,
                os.path.join(self.path, f"part-{self.token}-{i:05d}.jsonl"),
            )

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is not None and os.path.exists(msg.tmp_path):
                os.remove(msg.tmp_path)


class KVSnapshotStreamReader(SimpleDataSourceStreamReader):
    """File-granular streaming reader: each micro-batch ingests the part
    files that appeared since the last offset (the writer promotes files
    atomically via rename, so a file is either fully visible or absent —
    the same contract Spark's own file stream source relies on).

    Offsets are the sorted list of consumed file names — JSON-simple,
    replayable (``readBetweenOffsets`` re-reads exactly the files between
    two offsets for exactly-once recovery after a failed batch). This is
    the streaming face of the reference's cron-cadence incremental scan
    (dynamo fetch + high-water mark): the offset IS the watermark, kept
    by the engine's checkpoint instead of a side file."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvsnapshot requires option 'path'")
        self.permissive = options.get("mode", "strict").lower() == "permissive"
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _parse_file(self, full: str) -> Iterator[tuple]:
        with open(full, "rb") as f:
            for raw in f:
                raw = raw.strip()
                if not raw:
                    continue
                try:
                    rec = json.loads(raw)
                    if not isinstance(rec, dict):
                        raise ValueError("record is not a JSON object")
                except ValueError:
                    if self.permissive:
                        continue
                    raise
                yield tuple(rec.get(name) for name in self.fields)

    def _read_names(self, names) -> list:
        # Materialized, not a generator: the Simple stream API prefetches
        # on the driver and caches batch entries with copy.copy, which
        # cannot copy generators. (This API is the low-throughput path by
        # design — per-batch data lives on the driver either way; a
        # partition-parallel DataSourceStreamReader is the upgrade when
        # batches outgrow driver memory.)
        out = []
        for name in names:
            out.extend(self._parse_file(os.path.join(self.path, name)))
        return out

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        current = [os.path.basename(p) for p in _data_files(self.path)]
        new = sorted(n for n in current if n not in seen)
        end = {"seen": sorted(seen | set(new))}
        return self._read_names(new), end

    def readBetweenOffsets(self, start: dict, end: dict) -> list:
        delta = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return self._read_names(delta)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine checkpoint; nothing to release


class KVSnapshotDataSource(DataSource):
    """``spark.read.format("kvsnapshot")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "kvsnapshot"

    def schema(self) -> str:
        return self.options.get("ddl", DEFAULT_SCHEMA_DDL)

    def reader(self, schema: StructType) -> KVSnapshotReader:
        return KVSnapshotReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> KVSnapshotWriter:
        return KVSnapshotWriter(schema, dict(self.options), overwrite)

    def simpleStreamReader(self, schema: StructType) -> KVSnapshotStreamReader:
        return KVSnapshotStreamReader(schema, dict(self.options))


def register_kv_source(spark) -> None:
    """Idempotently register the kvsnapshot format on this session.

    Set at runtime (not in session-builder conf) because the round driver
    hands us a vanilla session — same pattern as the parquet-nanos conf in
    sources.tables.load_table."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # Re-registration replaces the prior entry (Spark logs a WARN), so this
    # is safe to call once per query; real failures propagate.
    spark.dataSource.register(KVSnapshotDataSource)
