"""MedicalNet feature extractor, perceptual distance, torch weight
conversion, FID plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.models.medicalnet import (
    MedicalNetResNet10,
    init_medicalnet,
    load_torch_state_dict,
    medicalnet_features,
    perceptual_distance,
)


@pytest.fixture(scope="module")
def net_vars():
    return init_medicalnet(seed=0)


def test_perceptual_distance_zero_for_identical(net_vars, rng):
    net, variables = net_vars
    x = jnp.asarray(rng.random((1, 16, 16, 16, 2)).astype(np.float32))
    d = float(perceptual_distance(net, variables, x, x))
    assert d == pytest.approx(0.0, abs=1e-6)


def test_perceptual_distance_positive_and_monotone(net_vars, rng):
    net, variables = net_vars
    x = jnp.asarray(rng.random((1, 16, 16, 16, 1)).astype(np.float32))
    n1 = x + 0.05 * jnp.asarray(
        rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32)
    )
    n2 = x + 0.5 * jnp.asarray(
        rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32)
    )
    d1 = float(perceptual_distance(net, variables, n1, x))
    d2 = float(perceptual_distance(net, variables, n2, x))
    assert 0 < d1 < d2


def test_medicalnet_features_concat_channels(net_vars, rng):
    net, variables = net_vars
    x = jnp.asarray(rng.random((2, 16, 16, 16, 3)).astype(np.float32))
    feats = medicalnet_features(net, variables, x)
    # 3 channels × 512 features, spatial /4.
    assert feats.shape == (2, 2, 2, 2, 512 * 3)


def test_torch_state_dict_conversion():
    torch = pytest.importorskip("torch")

    # Build a synthetic Med3D-layout state dict (random weights).
    sd = {}
    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k, k).numpy()
    def bn(name, c):
        sd[name + ".weight"] = torch.randn(c).numpy()
        sd[name + ".bias"] = torch.randn(c).numpy()
        sd[name + ".running_mean"] = torch.randn(c).numpy()
        sd[name + ".running_var"] = torch.rand(c).numpy() + 0.5

    conv("module.conv1", 64, 1, 7)
    bn("module.bn1", 64)
    chans = {"layer1": (64, 64), "layer2": (128, 64), "layer3": (256, 128),
             "layer4": (512, 256)}
    for layer, (c_out, c_in) in chans.items():
        conv(f"module.{layer}.0.conv1", c_out, c_in, 3)
        bn(f"module.{layer}.0.bn1", c_out)
        conv(f"module.{layer}.0.conv2", c_out, c_out, 3)
        bn(f"module.{layer}.0.bn2", c_out)
        if c_out != c_in:
            sd[f"module.{layer}.0.downsample.0.weight"] = torch.randn(
                c_out, c_in, 1, 1, 1
            ).numpy()
            bn(f"module.{layer}.0.downsample.1", c_out)

    variables = load_torch_state_dict(sd)
    net = MedicalNetResNet10()
    x = jnp.zeros((1, 16, 16, 16, 1))
    feats = net.apply(variables, x, train=False)
    assert feats.shape == (1, 2, 2, 2, 512)

    # Kernel layout conversion: torch (O,I,D,H,W) → flax (D,H,W,I,O).
    k = variables["params"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 7, 1, 64)
    np.testing.assert_allclose(
        np.asarray(k)[:, :, :, 0, 3],
        sd["module.conv1.weight"][3, 0], rtol=1e-6,
    )
