"""MedicalNet ResNet10 3D feature extractor (Med3D, Chen et al. 2019).

The reference's perceptual loss and FID both run features from MONAI's
``medicalnet_resnet10_23datasets`` network (reference ``src/model.py:127-129``
and ``src/model.py:235-257``). That model is a 3D ResNet-10 segmentation
backbone: 7³ stem conv (stride 2) → BN/ReLU → 3³ max-pool (stride 2) → four
BasicBlock stages [64, 128, 256, 512] where stages 3/4 keep stride 1 but
dilate 2/4 ('B'-type shortcuts).

Pretrained weights cannot be fetched in this environment; use
``load_torch_state_dict`` to convert a locally-provided Med3D torch checkpoint
into Flax params. Without a checkpoint the extractor is seeded deterministically
— random deep features remain a valid perceptual metric family
(random-feature perceptual distances correlate with learned ones), but parity
with the reference's numbers requires the converted weights.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicBlock3D(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        y = nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            strides=(self.stride,) * 3,
            kernel_dilation=(self.dilation,) * 3,
            padding=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            kernel_dilation=(self.dilation,) * 3,
            padding=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features,
                kernel_size=(1, 1, 1),
                strides=(self.stride,) * 3,
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class MedicalNetResNet10(nn.Module):
    """Feature extractor: single-channel NDHW1 volume → NDHWC feature map."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert x.shape[-1] == 1, "MedicalNet expects single-channel volumes"
        y = nn.Conv(
            64, kernel_size=(7, 7, 7), strides=(2, 2, 2), padding=3,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.max_pool(
            y, window_shape=(3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3
        )
        y = BasicBlock3D(64, name="layer1_0", dtype=self.dtype)(y, train)
        y = BasicBlock3D(128, stride=2, name="layer2_0", dtype=self.dtype)(y, train)
        y = BasicBlock3D(256, dilation=2, name="layer3_0", dtype=self.dtype)(y, train)
        y = BasicBlock3D(512, dilation=4, name="layer4_0", dtype=self.dtype)(y, train)
        return y


def init_medicalnet(seed: int = 0, dtype=None):
    """Deterministic init; returns (module, variables)."""
    net = MedicalNetResNet10(dtype=dtype)
    variables = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 16, 1)), train=False
    )
    return net, variables


def _torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    # torch Conv3d weight (O, I, D, H, W) → flax (D, H, W, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def load_torch_state_dict(state_dict: Dict[str, np.ndarray]):
    """Convert a Med3D torch ``state_dict`` (numpy-valued) to Flax variables
    for :class:`MedicalNetResNet10`. Accepts keys with or without the
    ``module.`` DataParallel prefix."""
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv(flax_path, torch_key):
        put(params, flax_path + ("kernel",), _torch_conv_to_flax(sd[torch_key]))

    def bn(flax_path, torch_prefix):
        put(params, flax_path + ("scale",), sd[f"{torch_prefix}.weight"])
        put(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])
        put(batch_stats, flax_path + ("mean",), sd[f"{torch_prefix}.running_mean"])
        put(batch_stats, flax_path + ("var",), sd[f"{torch_prefix}.running_var"])

    conv(("conv1",), "conv1.weight")
    bn(("bn1",), "bn1")
    for i, layer in enumerate(["layer1", "layer2", "layer3", "layer4"], 1):
        blk = f"{layer}_0"
        conv((blk, "conv1"), f"{layer}.0.conv1.weight")
        bn((blk, "bn1"), f"{layer}.0.bn1")
        conv((blk, "conv2"), f"{layer}.0.conv2.weight")
        bn((blk, "bn2"), f"{layer}.0.bn2")
        ds_key = f"{layer}.0.downsample.0.weight"
        if ds_key in sd:
            conv((blk, "downsample_conv"), ds_key)
            bn((blk, "downsample_bn"), f"{layer}.0.downsample.1")
    return {"params": params, "batch_stats": batch_stats}


def load_medicalnet(weights_path: Optional[str] = None, seed: int = 0):
    """(module, variables) — from a converted Med3D ``.npz`` checkpoint (see
    ``tools/convert_medicalnet.py``) when ``weights_path`` exists, else the
    deterministic random-feature fallback."""
    import os

    if weights_path and os.path.exists(weights_path):
        sd = dict(np.load(weights_path))
        return MedicalNetResNet10(), load_torch_state_dict(sd)
    return init_medicalnet(seed=seed)


def medicalnet_features(
    net: MedicalNetResNet10,
    variables,
    volume: jax.Array,
) -> jax.Array:
    """Per-channel feature extraction exactly like the reference FID path
    (``src/model.py:241-253``): each channel of ``(N, D, H, W, C)`` is run
    through the net separately and features are concatenated on the channel
    axis. Intensity normalisation (whole-tensor z-norm,
    ``src/model.py:222-226``) is the caller's job."""
    n, c = volume.shape[0], volume.shape[-1]
    slabs = [volume[..., i:i + 1] for i in range(c)]
    f = net.apply(variables, jnp.concatenate(slabs, axis=0), train=False)
    parts = [f[i * n:(i + 1) * n] for i in range(c)]
    return jnp.concatenate(parts, axis=-1)


def perceptual_distance(
    net: MedicalNetResNet10,
    variables,
    pred: jax.Array,
    target: jax.Array,
) -> jax.Array:
    """MedicalNet perceptual distance following MONAI's
    ``MedicalNetPerceptualSimilarity`` (is_fake_3d=False), the network behind
    the reference's ``PerceptualLoss`` (``src/model.py:127-129``):
    per-volume intensity z-norm → per-channel features → channel-unit-normalise
    → squared difference → sum over feature channels → spatial+batch mean.
    """

    from unet_bssfp_tpu.ops.metrics import znorm

    n, c = pred.shape[0], pred.shape[-1]
    zp, zt = znorm(pred), znorm(target)
    # One batched net call instead of 2·C sequential ones: stack every
    # (volume, channel) single-channel input on the batch axis — identical
    # math, ~2× fewer launches and much better utilisation on TPU.
    slabs = [zp[..., i:i + 1] for i in range(c)]
    slabs += [zt[..., i:i + 1] for i in range(c)]
    feats = net.apply(
        variables, jnp.concatenate(slabs, axis=0), train=False
    )  # (2*C*N, d', h', w', F)

    def unit(f):
        norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True)) + 1e-10
        return f / norm

    fu = unit(feats)
    fp, ft = fu[: c * n], fu[c * n:]
    diff2 = (fp - ft) ** 2
    # sum over feature channels, mean over everything else — matches the
    # per-channel jnp.mean(jnp.sum(..., -1)) of the sequential form because
    # every (channel, batch) slab has identical spatial extent.
    return jnp.mean(jnp.sum(diff2, axis=-1))
