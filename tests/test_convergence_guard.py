"""Guard-side logic of scripts/convergence_bench.py.

The training half is covered by the slow-tier convergence runs; these
pin the pure history logic, after a KeyError in the prior-record filter
crashed a finished 36-minute on-chip guard run before it was recorded
(2026-08-19)."""

import argparse
import os
import subprocess
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)

from convergence_bench import CANONICAL, prior_entries  # noqa: E402


def _args(**over):
    base = dict(smoke=False, full_objective=False, linked=True,
                samples_per_vol=4)
    base.update(over)
    return argparse.Namespace(**base)


RECORD = {"smoke": False, "full_objective": False, "linked": True,
          "samples_per_vol": 4, "epochs": 12, "val_psnr_last": 15.46}


def test_foreign_regime_entries_do_not_crash_the_filter():
    history = [
        # multistage_bench entry: stage_epochs, no "epochs" key
        {"smoke": False, "linked": True, "samples_per_vol": 32,
         "multistage": True, "stage_epochs": {"pretrain": 8},
         "val_psnr_last": 19.76},
        # oracle-style entry: no val_psnr_last at all
        {"smoke": False, "kind": "oracle_ceiling"},
        # a genuine same-regime prior
        dict(RECORD, val_psnr_last=15.01),
    ]
    prior = prior_entries(history, RECORD, _args())
    assert [r["val_psnr_last"] for r in prior] == [15.01]


def test_regime_keys_must_all_match():
    history = [
        dict(RECORD, samples_per_vol=32),
        dict(RECORD, full_objective=True),
        dict(RECORD, smoke=True),
        dict(RECORD, epochs=30),
    ]
    assert prior_entries(history, RECORD, _args()) == []


def test_canonical_regime_is_pinned():
    # The guard's contract: these exact values define the canonical band.
    assert CANONICAL["epochs"] == 12
    assert CANONICAL["linked"] is True
    assert CANONICAL["samples_per_vol"] == 4
    assert abs(CANONICAL["expected_psnr"] - 15.46) < 1e-9


@pytest.mark.slow
def test_canonical_cpu_guard_in_band():
    """Round-4 VERDICT #5: the convergence guard must run from something
    that executes every round. This runs the pinned CANONICAL_CPU regime
    (smoke-scale linked fixture, single-device CPU backend) end-to-end via
    the real CLI and fails when final val PSNR leaves the band — so a
    convergence regression fails the slow tier without anyone remembering
    to fire the ~35-min on-chip --check."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["UNET_BSSFP_PLATFORM"] = "cpu"  # pinned band is single-device CPU
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "convergence_bench.py"),
         "--check-cpu", "--no-record"],
        capture_output=True, text=True, timeout=2400, env=env, cwd=repo,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "canonical check ok" in proc.stdout
