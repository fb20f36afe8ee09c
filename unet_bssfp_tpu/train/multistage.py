"""Multi-stage pretrain → transfer → finetune training (MultiInputUNet).

The regime the published finetune metrics come from (thesis
03-methods.tex Training; BASELINE.md 'multi-stage' table), which the current
reference code lost (SURVEY.md §0): supervised training of
:class:`MultiInputUNet` with ``L1 + (1 - SSIM) + perceptual`` loss,

- PRETRAIN: autoencode the DT (input = target modality ``dwi-tensor``),
- TRANSFER: swap to the new modality's input head and train only it
  (backbone frozen via an optax gradient mask),
- FINE_TUNE: all parameters trainable at lr 1e-5.

``change_training_state`` from the reference eval API
(``src/eval.py:199``) decomposes into stage-specific step functions built
here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unet_bssfp_tpu.config import Config, ModelConfig, TrainConfig
from unet_bssfp_tpu.models.multi_input_unet import (
    MultiInputUNet,
    TrainingState,
    stage_lr,
    trainable_mask,
)
from unet_bssfp_tpu.ops.losses import l1_loss, ssim_loss
from unet_bssfp_tpu.ops.metrics import mae, psnr, ssim3d


@struct.dataclass
class SupervisedState:
    step: jax.Array
    rng: jax.Array
    params: Any
    opt_state: Any


def build_multi_input_unet(
    modality: str, mcfg: ModelConfig, mesh=None
) -> MultiInputUNet:
    from unet_bssfp_tpu.train.state import auto_packed

    kw = {}
    if mcfg.multistage_features is not None:
        kw["features"] = tuple(mcfg.multistage_features)
    # Same gate as build_models: data-parallel meshes run the Pallas conv
    # via shard_map; space-sharded meshes fall back to the XLA paths.
    packed = auto_packed(mcfg, mesh)
    return MultiInputUNet(
        modality=modality,
        out_channels=mcfg.out_channels,
        dropout=mcfg.dropout,
        dtype=jnp.dtype(mcfg.compute_dtype),
        use_fused=mcfg.use_pallas,
        packed=packed,
        **kw,
    )


def create_supervised_state(
    key: jax.Array,
    net: MultiInputUNet,
    tcfg: TrainConfig,
    stage: TrainingState,
    patch_size: int = 64,
    params: Optional[Any] = None,
) -> SupervisedState:
    from unet_bssfp_tpu.config import MODALITY_CHANNELS

    k_init, k_state = jax.random.split(key)
    if params is None:
        x = jnp.zeros(
            (1, patch_size, patch_size, patch_size,
             MODALITY_CHANNELS[net.modality])
        )
        params = net.init(
            {"params": k_init, "dropout": k_state}, x, train=False
        )["params"]
    opt = make_stage_optimizer(params, tcfg, stage)
    return SupervisedState(
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
        params=params,
        opt_state=opt.init(params),
    )


def make_stage_optimizer(params, tcfg: TrainConfig, stage: TrainingState):
    """AdamW with the stage's lr, restricted to the stage's trainable subtree
    (TRANSFER freezes the backbone; thesis 03-methods.tex). Frozen leaves get
    ``set_to_zero`` updates (``optax.masked`` would pass raw gradients
    through for unmasked leaves)."""
    lr = stage_lr(stage, tcfg.lr, tcfg.finetune_lr)
    opt = optax.adamw(
        lr, b1=tcfg.b1, b2=tcfg.b2, eps=1e-8,
        weight_decay=tcfg.weight_decay,
    )
    mask = trainable_mask(params, stage)
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", mask
    )
    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()}, labels
    )


def make_supervised_train_step(
    net: MultiInputUNet,
    tcfg: TrainConfig,
    stage: TrainingState,
    params_template,
    perceptual_fn: Optional[Callable] = None,
    mesh=None,
):
    """Jitted supervised step ``(state, x, y) -> (state, metrics)`` with the
    thesis loss: ``L1 + (1 - SSIM) + perceptual`` (perceptual scaled by
    ``perceptual_factor``)."""
    opt = make_stage_optimizer(params_template, tcfg, stage)

    def step(state: SupervisedState, x: jax.Array, y: jax.Array):
        rng, k_drop = jax.random.split(state.rng)

        def loss_fn(params):
            y_hat = net.apply(
                {"params": params}, x, train=True,
                rngs={"dropout": k_drop},
            )
            y_hat32 = y_hat.astype(jnp.float32)
            y32 = y.astype(jnp.float32)
            terms = {
                "L1": l1_loss(y_hat32, y32),
                "SSIM": ssim_loss(y_hat32, y32),
            }
            if perceptual_fn is not None:
                terms["Perceptual"] = (
                    perceptual_fn(y_hat32, y32) * tcfg.perceptual_factor
                )
            return sum(terms.values()), terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, rng=rng, params=params, opt_state=opt_state
        )
        metrics = {"train_loss": loss}
        for name, val in terms.items():
            metrics[f"train_loss_{name}"] = val
        return new_state, metrics

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        bshard = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (repl, bshard, bshard)
        kwargs["out_shardings"] = (repl, repl)
        from unet_bssfp_tpu.train.steps import _with_conv_mesh

        step = _with_conv_mesh(step, mesh)
    return jax.jit(step, **kwargs)


def make_supervised_eval_step(
    net: MultiInputUNet,
    tcfg: TrainConfig,
    perceptual_fn: Optional[Callable] = None,
    mesh=None,
):
    def step(state: SupervisedState, x: jax.Array, y: jax.Array):
        y_hat = net.apply({"params": state.params}, x, train=False)
        y_hat32 = y_hat.astype(jnp.float32)
        y32 = y.astype(jnp.float32)
        terms = {
            "L1": l1_loss(y_hat32, y32),
            "SSIM": ssim_loss(y_hat32, y32),
        }
        if perceptual_fn is not None:
            terms["Perceptual"] = (
                perceptual_fn(y_hat32, y32) * tcfg.perceptual_factor
            )
        metrics = {"val_loss": sum(terms.values())}
        for name, val in terms.items():
            metrics[f"val_loss_{name}"] = val
        metrics["val_metric_PSNR"] = jnp.mean(psnr(y_hat32, y32))
        metrics["val_metric_SSIM"] = jnp.mean(ssim3d(y_hat32, y32))
        metrics["val_metric_L1"] = jnp.mean(mae(y_hat32, y32))
        return metrics, y_hat

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        bshard = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (repl, bshard, bshard)
        from unet_bssfp_tpu.train.steps import _with_conv_mesh

        step = _with_conv_mesh(step, mesh)
    return jax.jit(step, **kwargs)


def transfer_params(pretrained_params, target_net: MultiInputUNet, key,
                    patch_size: int = 64):
    """Initialise the target modality's net, grafting the pretrained backbone
    (the TRANSFER head-swap): unet subtree copied, head subtree fresh unless
    head-groups match."""
    from unet_bssfp_tpu.config import MODALITY_CHANNELS

    x = jnp.zeros(
        (1, patch_size, patch_size, patch_size,
         MODALITY_CHANNELS[target_net.modality])
    )
    fresh = target_net.init(
        {"params": key, "dropout": key}, x, train=False
    )["params"]
    out = dict(fresh)
    # Head names encode their group (head_head6/head_head24), so a plain
    # name match reuses the backbone always and a head only when the target
    # modality shares the pretrained head's group.
    for name in fresh:
        if name in pretrained_params:
            out[name] = pretrained_params[name]
    return out


def run_multistage(
    data,
    target_modality: str,
    config: Optional[Config] = None,
    perceptual_fn: Optional[Callable] = None,
    epochs_per_stage: Optional[Dict[TrainingState, int]] = None,
    mesh=None,
    pretrain_data=None,
) -> Tuple[Dict[TrainingState, SupervisedState], Dict[str, float]]:
    """Drive the three stages end-to-end for one target modality. Returns the
    per-stage final states and the last stage's epoch metrics.

    ``pretrain_data``: optional separate data module for the PRETRAIN stage —
    the thesis regime pretrains the DT autoencoder on a LARGE cohort and
    transfers/finetunes on the small target cohort (``data``); when omitted
    all stages share ``data`` (single-cohort, as before)."""
    from unet_bssfp_tpu.parallel.mesh import make_mesh, shard_batch
    from unet_bssfp_tpu.train.logging import EarlyStopping, MetricLogger

    config = config or Config()
    tcfg = config.train
    if perceptual_fn is None:
        # Thesis loss is L1 + (1−SSIM) + perceptual (03-methods.tex:753-796);
        # same tri-state resolution as Trainer: the term turns on only when
        # converted Med3D weights resolve (random features at 1e3 weighting
        # are measured to hurt voxel fidelity — CONVERGENCE.json).
        from unet_bssfp_tpu.train.loop import (
            build_perceptual_fn,
            resolve_with_perceptual,
        )

        if resolve_with_perceptual(tcfg):
            perceptual_fn = build_perceptual_fn(config)
    if mesh is None:
        # Regular batches are config.data.batch_size; dim 0 must divide the
        # mesh size (same guard as Trainer.__init__).
        import math

        mesh = make_mesh(
            math.gcd(config.data.batch_size, len(jax.devices()))
        )
    epochs_per_stage = epochs_per_stage or {}
    patch = config.data.patch_size
    key = jax.random.PRNGKey(tcfg.seed)

    states: Dict[TrainingState, SupervisedState] = {}
    row: Dict[str, float] = {}
    params = None
    for stage in (TrainingState.PRETRAIN, TrainingState.TRANSFER,
                  TrainingState.FINE_TUNE):
        modality = (
            "dwi-tensor" if stage == TrainingState.PRETRAIN else target_modality
        )
        stage_data = (
            pretrain_data
            if stage == TrainingState.PRETRAIN and pretrain_data is not None
            else data
        )
        net = build_multi_input_unet(modality, config.model, mesh=mesh)
        key, k_stage = jax.random.split(key)
        if stage == TrainingState.TRANSFER and params is not None:
            params = transfer_params(params, net, k_stage, patch)
        state = create_supervised_state(
            k_stage, net, tcfg, stage, patch, params=params
        )
        train_step = make_supervised_train_step(
            net, tcfg, stage, state.params, perceptual_fn, mesh
        )
        eval_step = make_supervised_eval_step(net, tcfg, perceptual_fn, mesh)
        logger = MetricLogger(
            f"{tcfg.log_dir}/multistage-{target_modality}-{stage.value}"
        )
        from unet_bssfp_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(
            f"{tcfg.checkpoint_dir}/multistage-{target_modality}-"
            f"{stage.value}",
            monitor="val_loss",
            top_k=tcfg.checkpoint_top_k,
            config_json=config.to_json(),
        )
        stopper = EarlyStopping("val_loss", patience=tcfg.early_stop_patience)
        n_epochs = epochs_per_stage.get(stage, tcfg.max_epochs)
        keys = (modality, "dwi-tensor")
        epoch_key = jax.random.PRNGKey(tcfg.seed + 17)
        # A final partial batch must stay divisible by the mesh size or the
        # P("data") in_shardings reject it (mirrors loop.py's Trainer.fit).
        n_dev = mesh.devices.size
        for epoch in range(n_epochs):
            epoch_key, k_tr, k_val = jax.random.split(epoch_key, 3)
            for batch in stage_data.train_batches(
                k_tr, keys=keys, batch_divisor=n_dev
            ):
                batch = shard_batch(mesh, batch)
                state, m = train_step(
                    state, batch[modality], batch["dwi-tensor_orig"]
                )
                logger.log_step(m)
            for batch in stage_data.val_batches(
                k_val, keys=keys, batch_divisor=n_dev
            ):
                batch = shard_batch(mesh, batch)
                m, _ = eval_step(
                    state, batch[modality], batch["dwi-tensor_orig"]
                )
                logger.log_step(m)
            row = logger.end_epoch(epoch)
            ckpt.save(epoch, state, row)
            if stopper.update(row):
                break
        ckpt.wait()
        params = state.params
        states[stage] = state
    return states, row
