"""Two-process multi-host data feeding (VERDICT r2 #4).

Backs the TPU-pod claims in ``scripts/run_train.sh``: spawns two
``jax.distributed`` CPU processes (localhost coordinator, 2 virtual devices
each), each feeding its ``process_split`` stride-slice through
``shard_batch``'s ``make_array_from_process_local_data`` branch and running
one jitted GAN train step over the global 4-device mesh — then asserts the
global metrics equal a single-process (4-device) run over the same samples,
itself executed in a fresh subprocess so both sides see pristine jax config.

The step's metrics/batch-stats are means over the global batch, so they are
invariant to the inter-process interleaving of samples (dropout is off).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def bids_root(tmp_path_factory):
    from unet_bssfp_tpu.data.synthetic import make_synthetic_bids

    root = tmp_path_factory.mktemp("mh_bids")
    return make_synthetic_bids(
        str(root),
        subjects=tuple(f"{i:02d}" for i in range(1, 9)),
        sessions=("1",),
        volume_shape=(16, 16, 16),
    )


def _run_workers(nprocs, bids_root, out_json):
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nprocs), str(port),
             bids_root, out_json],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker ({nprocs}-proc) failed:\n{out}"
    with open(out_json) as f:
        return json.load(f)


def test_two_process_training_matches_single(bids_root, tmp_path):
    # Both sides run in FRESH subprocesses: an in-process reference inherits
    # whatever global jax config earlier suite tests left behind (matmul
    # precision, x64, debug flags), which perturbs gradient rounding enough
    # to flip AdamW sign-descent on near-zero gradients — the historical
    # in-suite flake. Worker-vs-worker removes that failure mode.
    result = _run_workers(2, bids_root, str(tmp_path / "mh2.json"))
    single = _run_workers(1, bids_root, str(tmp_path / "mh1.json"))
    assert result["local_samples"] == 2
    assert single["local_samples"] == 4

    # --- global-batch assembly fingerprint (numpy-only, no jax) ----------
    # The union of the two process-local stride-slices must be exactly the
    # full sample set.
    from unet_bssfp_tpu.config import DataConfig
    from unet_bssfp_tpu.data.datamodule import DoveDataModule

    dcfg = DataConfig(
        data_dir=bids_root,
        volume_shape=(16, 16, 16),
        test_split=0.25,
        val_split=0.25,
    )
    data = DoveDataModule(bids_root, config=dcfg)
    data.prepare_data()
    assert len(data.train_samples) == 4
    vols = [data.load_subject(s, ("dwi-tensor",)) for s in data.train_samples]
    x = np.stack([v["dwi-tensor"] for v in vols])
    for r in (result, single):
        np.testing.assert_allclose(r["batch_sum"], float(np.sum(x)),
                                   rtol=1e-6)
        np.testing.assert_allclose(r["batch_sumsq"], float(np.sum(x * x)),
                                   rtol=1e-6)

    assert set(result["metrics"]) == set(single["metrics"])
    for k, v in single["metrics"].items():
        # train_discr_loss is computed AFTER the generator update; early
        # AdamW is ≈ sign descent, so cross-process gradient-reduction-order
        # noise flips near-zero-gradient signs and parameter deltas differ
        # by ±2·lr regardless of how small the noise is (the property
        # test_torch_parity documents). lr=1e-6 in the worker keeps that
        # amplification small; every PRE-update metric — which is what
        # actually validates multi-host data assembly, forward, and loss
        # math — must match tightly.
        rtol = 2e-2 if k == "train_discr_loss" else 2e-5
        np.testing.assert_allclose(
            result["metrics"][k], float(v), rtol=rtol, atol=2e-6,
            err_msg=k,
        )
