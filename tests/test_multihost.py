"""Two-process multi-host data feeding (VERDICT r2 #4).

Backs the TPU-pod claims in ``scripts/run_train.sh``: spawns two
``jax.distributed`` CPU processes (localhost coordinator, 2 virtual devices
each), each feeding its ``process_split`` stride-slice through
``shard_batch``'s ``make_array_from_process_local_data`` branch and running
one jitted GAN train step over the global 4-device mesh — then asserts the
global metrics equal a single-process run over the same samples.

The step's metrics/batch-stats are means over the global batch, so they are
invariant to the inter-process interleaving of samples (dropout is off).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
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


def test_two_process_training_matches_single(bids_root, tmp_path):
    out_json = str(tmp_path / "multihost.json")
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port),
             bids_root, out_json],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    with open(out_json) as f:
        result = json.load(f)
    assert result["local_samples"] == 2

    # --- single-process reference over the SAME samples ------------------
    from unet_bssfp_tpu.config import DataConfig, ModelConfig, TrainConfig
    from unet_bssfp_tpu.data.datamodule import DoveDataModule
    from unet_bssfp_tpu.parallel.mesh import make_mesh, shard_batch
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

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

    # global-batch assembly fingerprint: the union of the two process-local
    # slices must be exactly the full sample set
    np.testing.assert_allclose(
        result["batch_sum"], float(np.sum(x)), rtol=1e-6
    )
    np.testing.assert_allclose(
        result["batch_sumsq"], float(np.sum(x * x)), rtol=1e-6
    )

    mcfg = ModelConfig(
        features=(4, 4, 4, 4, 8, 4),
        disc_features=(4, 8),
        dropout=0.0,
        compute_dtype="float32",
        packed=False,
        folded=False,
    )
    # lr=1e-6: the disc loss sees the *updated* G, and early AdamW is
    # ≈ sign descent — cross-process gradient-reduction-order noise flips
    # near-zero-gradient signs, so parameter deltas are ±2·lr regardless of
    # how small the noise is (same property test_torch_parity documents).
    # A small lr keeps that amplification below the metric tolerance.
    tcfg = TrainConfig(rng_impl="", lr=1e-6)
    state = create_gan_state(
        jax.random.PRNGKey(0), "dwi-tensor", mcfg, tcfg, patch_size=16
    )
    mesh = make_mesh(4)
    gen, disc = build_models("dwi-tensor", mcfg)
    step = make_train_step(gen, disc, tcfg, mesh=mesh, donate=False)
    batch = shard_batch(mesh, {"x": jnp.asarray(x)})
    _, metrics = step(state, batch["x"], batch["x"])

    for k, v in metrics.items():
        assert k in result["metrics"], k
        # train_discr_loss is computed AFTER the generator update, so it
        # inherits the sign-descent amplification described above (observed
        # up to ~1% in-suite, where earlier tests perturb global jax config
        # and hence gradient rounding); every PRE-update metric — which is
        # what actually validates multi-host data assembly, forward, and
        # loss math — must match tightly.
        rtol = 2e-2 if k == "train_discr_loss" else 2e-5
        np.testing.assert_allclose(
            result["metrics"][k], float(v), rtol=rtol, atol=2e-6,
            err_msg=k,
        )
