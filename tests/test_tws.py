"""transformWithState processors (streaming/tws.py): the fold logic and
the processor contract run against a state shim — the Spark wiring needs
worker-side protobuf, which this container lacks (gated, like the Delta
ledger), so what CAN be verified here is everything except the wire."""

from __future__ import annotations

import pandas as pd
import pytest

from batch_public_spark.streaming.tws import (
    _make_processor,
    fold_batches,
    running_user_stats,
    tws_available,
)


def test_fold_from_empty_and_prior():
    b1 = pd.DataFrame({"value": [1.0, 5.0, 3.0]})
    b2 = pd.DataFrame({"value": [4.0]})
    n, s, mx = fold_batches(None, iter([b1, b2]))
    assert (n, s, mx) == (4, 13.0, 5.0)
    # resumes from prior state
    n, s, mx = fold_batches((4, 13.0, 5.0), iter([pd.DataFrame({"value": [9.0]})]))
    assert (n, s, mx) == (5, 22.0, 9.0)
    # empty batch iterator keeps prior untouched
    assert fold_batches((2, 1.0, 0.5), iter([])) == (2, 1.0, 0.5)
    # empty frames are skipped
    assert fold_batches(None, iter([pd.DataFrame({"value": []})])) == (0, 0.0, None)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        self.states[name] = _FakeValueState()
        return self.states[name]


def test_processor_contract_via_shim():
    proc = _make_processor()()
    handle = _FakeHandle()
    proc.init(handle)
    out1 = list(
        proc.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [2.0, 8.0]})]), timerValues=None
        )
    )
    assert len(out1) == 1
    row = out1[0].iloc[0]
    assert (row["user_id"], row["n_events"], row["sum_value"], row["max_value"]) == (
        7,
        2,
        10.0,
        8.0,
    )
    # second micro-batch folds onto persisted state
    out2 = list(
        proc.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [1.0]})]), timerValues=None
        )
    )
    row = out2[0].iloc[0]
    assert (row["n_events"], row["sum_value"], row["max_value"]) == (3, 11.0, 8.0)
    proc.close()


def test_gate_raises_without_protobuf(spark):
    if tws_available():  # pragma: no cover - provisioned environments
        pytest.skip("protobuf present; gate inactive")
    from batch_public_spark.streaming.ops import read_events_stream

    with pytest.raises(ImportError, match="protobuf"):
        running_user_stats(read_events_stream(spark, "/root/testdata/sf0.001"))
