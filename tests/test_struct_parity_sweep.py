"""Presence/absence lattice parity sweeps: struct engine == xpath engine.

The fixtures and runner live in recordmanager_spark.parity (shared with
``tools/verify_oracle.py --perturb``); see that module's docstring for
the rationale — the round-3 LRMI null-concat bug was a present/absent
combination no fixture covered, and the full subset lattice covers all
of them mechanically.
"""

from __future__ import annotations

import pytest

from recordmanager_spark.parity import DRIVERS, sweep_driver


@pytest.mark.parametrize("driver", sorted(DRIVERS))
def test_sweep(spark, driver):
    diffs = sweep_driver(spark, driver)
    assert diffs == [], f"{driver}: {len(diffs)} engine disagreements: {diffs[:5]}"
