"""Train state: the full GAN training pytree.

Orbax-checkpointable equivalent of the reference LightningModule's mutable
state (``src/model.py:141-165``): generator and discriminator
params/batch-stats, the two AdamW optimizer states
(``configure_optimizers``, ``src/model.py:359-361``), the step counter and
the RNG key.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unet_bssfp_tpu.config import ModelConfig, TrainConfig
from unet_bssfp_tpu.models import Discriminator, Generator


@struct.dataclass
class GANTrainState:
    step: jax.Array
    rng: jax.Array
    gen_params: Any
    gen_batch_stats: Any
    disc_params: Any
    disc_batch_stats: Any
    gen_opt_state: Any
    disc_opt_state: Any


def make_optimizer(cfg: TrainConfig, lr: Optional[float] = None):
    """AdamW with torch-default hyperparameters (reference
    ``torch.optim.AdamW(lr=1e-3)``, ``src/model.py:164,359-361`` → betas
    (0.9, 0.999), eps 1e-8, weight decay 0.01)."""
    return optax.adamw(
        lr if lr is not None else cfg.lr,
        b1=cfg.b1,
        b2=cfg.b2,
        eps=1e-8,
        weight_decay=cfg.weight_decay,
    )


def auto_packed(mcfg: ModelConfig, mesh=None) -> bool:
    """Resolve the packed-conv gate against the topology the step will
    actually run on (ADVICE r2: key on the intended mesh, not the global
    device count).

    - explicit ``mcfg.packed`` always wins;
    - no mesh: packed iff a single TPU chip is attached;
    - a mesh: packed on TPU — the kernels shard_map over the ``data`` axis,
      and over a ``space`` axis with ppermute d-halo exchange
      (``ops.pallas.conv3d``, ``packed_conv_mesh``); shapes that do not
      divide an axis fall back per-conv inside the wrapper.
    """
    if mcfg.packed is not None:
        return mcfg.packed
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return False
    if mesh is None:
        return len(jax.devices()) == 1
    return True


def build_models(modality: str, mcfg: ModelConfig, mesh=None):
    from unet_bssfp_tpu.config import MODALITIES

    if modality not in MODALITIES:
        raise ValueError(
            f"unknown modality {modality!r}; expected one of {MODALITIES}"
        )
    dtype = jnp.dtype(mcfg.compute_dtype)
    on_tpu = jax.default_backend() == "tpu"
    folded = mcfg.folded if mcfg.folded is not None else on_tpu
    packed = auto_packed(mcfg, mesh)
    gen = Generator(
        modality=modality,
        unet_in_channels=mcfg.unet_in_channels,
        out_channels=mcfg.out_channels,
        features=mcfg.features,
        dropout=mcfg.dropout,
        unet_negative_slope=mcfg.unet_negative_slope,
        head_negative_slope=mcfg.disc_negative_slope,
        dtype=dtype,
        remat=mcfg.remat,
        use_fused=mcfg.use_pallas,
        folded=folded,
        packed=packed,
        wpack_mid=mcfg.wpack_mid,
    )
    # auto = False: measured 0.34–0.65× fwd+bwd vs XLA's plain k4s2 at the
    # dominant disc stages on v5e (scripts/disc_conv_probe.py, round 3).
    disc_folded = (
        mcfg.disc_folded if mcfg.disc_folded is not None else False
    )
    disc = Discriminator(
        modality=modality,
        features=mcfg.disc_features,
        negative_slope=mcfg.disc_negative_slope,
        dtype=dtype,
        folded=disc_folded,
    )
    return gen, disc


def create_gan_state(
    key: jax.Array,
    modality: str,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    patch_size: int = 64,
    in_channels: Optional[int] = None,
) -> GANTrainState:
    from unet_bssfp_tpu.config import MODALITY_CHANNELS

    # The PRNG implementation shapes the key arrays inside the state
    # (threefry (2,) vs rbg (4,)): apply it before any key is created so
    # checkpoints restore into templates with matching shapes regardless of
    # which entry point builds the template. A RAW key minted under a
    # different global default (its shape mismatches the impl selected here)
    # is re-seeded from its last word — either direction, so callers that
    # built their key before this config switch never see a shape error.
    if tcfg.rng_impl:
        jax.config.update("jax_default_prng_impl", tcfg.rng_impl)
        expected = {"threefry2x32": (2,), "rbg": (4,), "unsafe_rbg": (4,)}
        want = expected.get(tcfg.rng_impl)
        is_raw = isinstance(key, jax.Array) and not jax.dtypes.issubdtype(
            key.dtype, jax.dtypes.prng_key
        )
        if is_raw and want is not None and key.shape != want:
            key = jax.random.PRNGKey(int(key[-1]))

    gen, disc = build_models(modality, mcfg)
    in_ch = in_channels or MODALITY_CHANNELS[modality]
    x = jnp.zeros((1, patch_size, patch_size, patch_size, in_ch))
    y = jnp.zeros(
        (1, patch_size, patch_size, patch_size, mcfg.out_channels)
    )
    k_gen, k_disc, k_state = jax.random.split(key, 3)
    gen_vars = gen.init(
        {"params": k_gen, "dropout": k_state}, x, train=False
    )
    disc_vars = disc.init({"params": k_disc}, x, y, train=False)

    opt = make_optimizer(tcfg)
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
        gen_params=gen_vars["params"],
        gen_batch_stats=gen_vars.get("batch_stats", {}),
        disc_params=disc_vars["params"],
        disc_batch_stats=disc_vars.get("batch_stats", {}),
        gen_opt_state=opt.init(gen_vars["params"]),
        disc_opt_state=opt.init(disc_vars["params"]),
    )
