"""Mechanical enforcement of the correctness-window rotation policy.

The round driver attests exactly the first 50 registry entries each round
(``CORRECTNESS_r*.json``). The policy (plans/__init__.py docstring) is that
every registered query must be either already driver-attested, inside the
current 50-entry window, or explicitly scheduled in ``_NEXT_WINDOW`` for the
following round. This test turns that policy from prose into CI: adding a
query without scheduling it, or letting the deferred backlog outgrow a
single future window, fails the suite (verdict-r5 item #5).

No SparkSession needed — this is pure registry/records bookkeeping.
"""

import glob
import json
import os

from batch_public_spark import plans

WINDOW = 50
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_attested() -> set:
    union = set()
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            rec = json.load(fh)
        # count only rows the driver actually compared successfully
        union |= {name for name, row in rec.items() if isinstance(row, dict)}
    return union


def test_window_is_exactly_the_driver_prefix_size():
    assert len(plans._PRIORITY) == WINDOW
    assert len(set(plans._PRIORITY)) == WINDOW  # no duplicate slots


def test_next_window_fits_one_future_round_and_is_disjoint():
    assert len(plans._NEXT_WINDOW) <= WINDOW
    assert not set(plans._NEXT_WINDOW) & set(plans._PRIORITY)


def test_priority_names_lead_the_registry():
    assert list(plans.QUERIES)[:WINDOW] == plans._PRIORITY


def test_every_query_is_attested_windowed_or_scheduled():
    attested = _driver_attested()
    covered = attested | set(plans._PRIORITY) | set(plans._NEXT_WINDOW)
    stranded = [n for n in plans.QUERIES if n not in covered]
    assert not stranded, (
        "queries with no driver CORRECTNESS row, no slot in the current "
        f"50-entry window, and no _NEXT_WINDOW reservation: {stranded}; "
        "rotate plans/__init__.py before registering more queries"
    )
