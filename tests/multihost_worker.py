"""Worker for the two-process multi-host test (``tests/test_multihost.py``).

Each of ``nprocs`` processes owns ``4 // nprocs`` virtual CPU devices, loads
ONLY its ``process_split`` stride-slice of the synthetic BIDS train samples
(``data/datamodule.py``), assembles the global batch with ``shard_batch`` →
``jax.make_array_from_process_local_data`` (``parallel/mesh.py``), and runs
one jitted GAN train step over the global 4-device ``data`` mesh. Process 0
writes the (replicated) metrics and a global-batch fingerprint to JSON.

With ``nprocs=1`` this doubles as the single-process reference: the parent
test compares the 2-process JSON against the 1-process JSON, so BOTH sides
run under pristine jax config in fresh subprocesses (an in-process reference
inherits whatever global jax config earlier suite tests left behind, which
perturbs gradient rounding — the source of a rare in-suite flake).

Usage: python multihost_worker.py <pid> <nprocs> <port> <bids_dir> <out.json>
"""

import json
import os
import sys


def main() -> int:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, bids_dir, out_path = sys.argv[3], sys.argv[4], sys.argv[5]

    # 4 // nprocs local CPU devices per process, before any backend init.
    ndev_local = 4 // nprocs
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", ndev_local)
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4
    assert len(jax.local_devices()) == ndev_local

    import jax.numpy as jnp
    import numpy as np

    from unet_bssfp_tpu.config import DataConfig, ModelConfig, TrainConfig
    from unet_bssfp_tpu.data.datamodule import DoveDataModule
    from unet_bssfp_tpu.parallel.mesh import make_mesh, shard_batch
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    dcfg = DataConfig(
        data_dir=bids_dir,
        volume_shape=(16, 16, 16),
        test_split=0.25,
        val_split=0.25,
        process_split=True,
    )
    data = DoveDataModule(bids_dir, config=dcfg)
    data.prepare_data()
    # 4 train subjects stride-sliced over nprocs processes.
    assert len(data.train_samples) == 4 // nprocs, (
        f"process {pid}: expected {4 // nprocs} local samples, "
        f"got {len(data.train_samples)}"
    )

    vols = [data.load_subject(s, ("dwi-tensor",)) for s in data.train_samples]
    x_local = np.stack([v["dwi-tensor"] for v in vols])

    mesh = make_mesh(4)
    batch = shard_batch(mesh, {"x": x_local})
    x_global = batch["x"]
    assert x_global.shape[0] == 4, x_global.shape

    mcfg = ModelConfig(
        features=(4, 4, 4, 4, 8, 4),
        disc_features=(4, 8),
        dropout=0.0,
        compute_dtype="float32",
        packed=False,
        folded=False,
    )
    # lr matches tests/test_multihost.py (see comment there: small lr keeps
    # AdamW sign-descent amplification of reduction-order noise below the
    # metric tolerance).
    tcfg = TrainConfig(rng_impl="", lr=1e-6)
    state = create_gan_state(
        jax.random.PRNGKey(0), "dwi-tensor", mcfg, tcfg, patch_size=16
    )
    # Host-local → globally-consistent inputs (replicated sharding).
    state = jax.tree_util.tree_map(np.asarray, state)
    gen, disc = build_models("dwi-tensor", mcfg)
    step = make_train_step(gen, disc, tcfg, mesh=mesh, donate=False)

    new_state, metrics = step(state, x_global, x_global)
    jax.block_until_ready(new_state.gen_params)

    from jax.sharding import NamedSharding, PartitionSpec as P

    fingerprint = jax.jit(
        lambda x: (jnp.sum(x), jnp.sum(x * x)),
        out_shardings=NamedSharding(mesh, P()),
    )(x_global)

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "metrics": {k: float(v) for k, v in metrics.items()},
                    "batch_sum": float(fingerprint[0]),
                    "batch_sumsq": float(fingerprint[1]),
                    "local_samples": len(vols),
                },
                f,
            )
    if nprocs > 1:
        jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
