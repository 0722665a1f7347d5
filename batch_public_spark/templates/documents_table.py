"""Minimal integration template for one catalog table.

Copy this file, rename ``TABLE_NAME`` (and ``ID_COL`` if your schema
differs). The helper only invokes the shared pipeline — the heavy lifting
(timestamp discovery, dedup, watermarking, JSONL generation, batch
submission…) lives in :mod:`batch_public_spark.pipeline` and its
sub-modules. Mirrors reference templates/news_table.py:1-42 over the
Spark-native ``run_batch``.

Usage::

    python -m batch_public_spark.templates.documents_table --hours 24 --test
"""

from __future__ import annotations

import argparse
import json

from batch_public_spark.agent_api import run_batch

# Catalog table to process. Replace with your table name.
TABLE_NAME = "documents"


def _build_cli() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=f"One-off run for {TABLE_NAME}")
    parser.add_argument(
        "--hours", type=float, default=24, help="Look-back window in hours (default: 24)"
    )
    parser.add_argument("--model", choices=["nano", "mini", "full"], default="nano")
    parser.add_argument(
        "--test", action="store_true", help="Stop after JSONL generation (dry-run)"
    )
    parser.add_argument("--data-dir", default=None, help="Parquet catalog directory")
    parser.add_argument("--output-dir", default="output")
    return parser


def main(argv: list[str] | None = None) -> int:
    # Logger configured at run time, not import time (importing a module
    # must not create a logs/ directory in the caller's cwd).
    from batch_public_spark.logger import get_logger

    log = get_logger(__name__)
    args = _build_cli().parse_args(argv)
    summary = run_batch(
        TABLE_NAME,
        hours=args.hours,
        model=args.model,
        test_only=args.test,
        data_dir=args.data_dir,
        output_dir=args.output_dir,
    )
    log.info("run complete: %s", summary)
    print(json.dumps(summary))
    return 0 if summary["skipped_reason"] in (None, "no new rows") else 1


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
