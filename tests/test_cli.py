"""CLI + agent-façade tests (reference main.py:526-702, agent_api.py)."""

from __future__ import annotations

import json
import os

import pytest

from batch_public_spark import agent_api
from batch_public_spark.cli import main

SF = "/root/testdata/sf0.001"


def _run(capsys, *argv):
    rc = main(list(argv))
    out = capsys.readouterr().out
    return rc, out


def test_list_tables(capsys):
    rc, out = _run(capsys, "--list-tables", "--data-dir", SF)
    assert rc == 0
    names = out.split()
    assert "lineitem" in names and "events" in names


def test_list_models(capsys):
    rc, out = _run(capsys, "--list-models")
    assert rc == 0
    assert "nano -> gpt-4.1-nano-2025-04-14" in out


def test_dry_run_writes_jsonl_and_stops(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc, out = _run(
        capsys,
        "--table", "documents", "--hours", "1e9", "--test",
        "--data-dir", SF, "--output-dir", out_dir,
    )
    assert rc == 0
    info = json.loads(out.strip().splitlines()[-1])
    assert info["n_requests"] > 0
    assert info["batch_id"] is None  # dry run: no submission
    assert "jsonl_test" in info["jsonl_path"]
    # no watermark was persisted (dry-run never advances state)
    assert not os.path.exists(os.path.join(out_dir, "batch_watermark.json"))


def test_multi_table_forces_async_and_resume_closes(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc, out = _run(
        capsys,
        "--table", "documents,events", "--hours", "1e9",
        "--data-dir", SF, "--output-dir", out_dir,
    )
    assert rc == 0
    lines = [json.loads(line) for line in out.strip().splitlines()]
    assert len(lines) == 2
    assert all(line["async"] for line in lines)
    batch_ids = [line["batch_id"] for line in lines if line["batch_id"]]
    assert batch_ids

    # pending in the ledger until --check-outputs sweeps them (X4)
    with open(os.path.join(out_dir, "batch_status.json"), encoding="utf-8") as fh:
        ledger = json.load(fh)
    assert all("final_status" not in ledger[b] for b in batch_ids)

    rc, out = _run(capsys, "--check-outputs", "--output-dir", out_dir)
    assert rc == 0
    swept = json.loads(out)
    assert all(swept[b]["final_status"] == "completed" for b in batch_ids)


def test_agent_api_roundtrip(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    res = agent_api.run_batch(
        "documents", hours=1e9, test_only=False, data_dir=SF, output_dir=out_dir, spark=spark
    )
    assert res["batch_id"] and res["n_requests"] > 0
    entry = agent_api.resume_batch(res["batch_id"], output_dir=out_dir)
    assert entry["final_status"] == "completed"


def test_no_tables_selected_errors(tmp_path, capsys):
    rc = main(["--config", str(tmp_path / "missing.json"), "--data-dir", SF])
    assert rc == 2


def test_template_module_dry_run(spark, tmp_path, capsys):
    """The copyable per-table template (reference templates/news_table.py)
    runs --test end-to-end: JSONL written, no LLM call, summary on stdout."""
    from batch_public_spark.templates import documents_table

    rc = documents_table.main(
        [
            "--hours", "1000000",
            "--test",
            "--data-dir", SF,
            "--output-dir", str(tmp_path / "out"),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_requests"] > 0
    assert "jsonl_test" in summary["jsonl_path"]  # X7 quarantined dir
    assert summary["batch_id"] is None  # dry-run: nothing submitted


def test_rotating_logger_configuration(tmp_path, monkeypatch):
    """Reference logger.py:13-15 parity: 10 MB x 5 rotating file handler +
    console echo, configured once per logger name."""
    import logging
    from logging.handlers import RotatingFileHandler

    from batch_public_spark.logger import LOG_FILE_NAME, get_logger

    monkeypatch.setenv("BPS_LOG_DIR", str(tmp_path / "logs"))
    log = get_logger("bps.test.rotating")
    rotating = [h for h in log.handlers if isinstance(h, RotatingFileHandler)]
    assert len(rotating) == 1
    assert rotating[0].maxBytes == 10 * 1024 * 1024
    assert rotating[0].backupCount == 5
    assert any(
        isinstance(h, logging.StreamHandler) and not isinstance(h, RotatingFileHandler)
        for h in log.handlers
    )
    assert log.propagate is False

    log.info("hello rotation")
    rotating[0].flush()
    assert "hello rotation" in (tmp_path / "logs" / LOG_FILE_NAME).read_text()

    # configure-once: a second call must not duplicate handlers
    assert get_logger("bps.test.rotating").handlers == log.handlers


def test_cli_batch_mock_async_resume_across_processes(spark, tmp_path, capsys):
    """--batch-mock + --async submits through the durable mock provider;
    a LATER orchestrator (fresh mock instance over the same state_dir)
    resumes the entry through its poll states to download + close —
    the CLI's cron cadence across process boundaries."""
    out_dir = str(tmp_path / "out")
    rc, out = _run(
        capsys, "--table", "documents", "--hours", "1000000", "--async",
        "--batch-mock", "--data-dir", SF, "--output-dir", out_dir,
    )
    assert rc == 0
    bid = json.loads(out.strip().splitlines()[-1])["batch_id"]
    with open(os.path.join(out_dir, "batch_status.json"), encoding="utf-8") as fh:
        entry = json.load(fh)[bid]
    assert entry["transport"] == "provider"
    [prov] = entry["provider_batches"]
    assert prov["status"] == "validating"

    # later cron cycles: each --resume is one poll (validating → … → completed)
    for _ in range(4):
        rc, out = _run(
            capsys, "--resume", bid, "--batch-mock",
            "--data-dir", SF, "--output-dir", out_dir,
        )
        assert rc == 0
        entry = json.loads(out)[bid]
        if entry.get("final_status"):
            break
    assert entry["final_status"] == "completed"
    assert entry["output_paths"]
    # the downloaded JSONL parses through the shared parse stage
    from batch_public_spark.pipeline import parse_batch_output, read_batch_outputs

    parsed = parse_batch_output(read_batch_outputs(spark, entry["output_dir"]))
    assert parsed.count() >= entry["record_count"]
