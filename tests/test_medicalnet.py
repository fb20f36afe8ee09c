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


def _synthetic_med3d_state_dict(torch, seed: int = 0):
    """Random weights in the exact Med3D resnet10 state-dict layout
    (including the ``module.`` DataParallel prefix)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    def conv(name, o, i, k):
        sd[name + ".weight"] = (
            0.1 * torch.randn(o, i, k, k, k, generator=g)
        ).numpy()
    def bn(name, c):
        sd[name + ".weight"] = torch.randn(c, generator=g).numpy()
        sd[name + ".bias"] = torch.randn(c, generator=g).numpy()
        sd[name + ".running_mean"] = (
            0.1 * torch.randn(c, generator=g)
        ).numpy()
        sd[name + ".running_var"] = (
            torch.rand(c, generator=g) + 0.5
        ).numpy()

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
            sd[f"module.{layer}.0.downsample.0.weight"] = (
                0.1 * torch.randn(c_out, c_in, 1, 1, 1, generator=g)
            ).numpy()
            bn(f"module.{layer}.0.downsample.1", c_out)
    return sd


def test_torch_state_dict_conversion():
    torch = pytest.importorskip("torch")

    sd = _synthetic_med3d_state_dict(torch)
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


def _torch_med3d_resnet10(torch, nn_t, state_dict):
    """Minimal in-test torch Med3D resnet10 (Chen et al. 2019, shortcut 'B'),
    mirroring the network MONAI's medicalnet_resnet10_23datasets loads — the
    golden model for converter/architecture parity."""

    class BasicBlock(nn_t.Module):
        def __init__(self, inp, out, stride=1, dilation=1):
            super().__init__()
            self.conv1 = nn_t.Conv3d(
                inp, out, 3, stride=stride, padding=dilation,
                dilation=dilation, bias=False,
            )
            self.bn1 = nn_t.BatchNorm3d(out)
            self.conv2 = nn_t.Conv3d(
                out, out, 3, padding=dilation, dilation=dilation, bias=False
            )
            self.bn2 = nn_t.BatchNorm3d(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = nn_t.Sequential(
                    nn_t.Conv3d(inp, out, 1, stride=stride, bias=False),
                    nn_t.BatchNorm3d(out),
                )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + r)

    class ResNet10(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn_t.Conv3d(1, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn_t.BatchNorm3d(64)
            self.maxpool = nn_t.MaxPool3d(3, stride=2, padding=1)
            self.layer1 = nn_t.Sequential(BasicBlock(64, 64))
            self.layer2 = nn_t.Sequential(BasicBlock(64, 128, stride=2))
            self.layer3 = nn_t.Sequential(BasicBlock(128, 256, dilation=2))
            self.layer4 = nn_t.Sequential(BasicBlock(256, 512, dilation=4))

        def forward(self, x):
            y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(y))))

    model = ResNet10()
    clean = {
        k.replace("module.", ""): torch.as_tensor(v)
        for k, v in state_dict.items()
    }
    missing, unexpected = model.load_state_dict(clean, strict=False)
    # Only BN num_batches_tracked buffers may be absent.
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing
    model.eval()
    return model


def test_medicalnet_matches_torch_golden(rng):
    """Numerical parity: the Flax MedicalNet with converted weights matches a
    torch Med3D resnet10 with the same weights within 1e-3 (VERDICT item 3 —
    validates both the converter and the architecture port, reference
    src/model.py:127-129)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn_t

    sd = _synthetic_med3d_state_dict(torch, seed=7)
    x = rng.standard_normal((2, 17, 16, 19, 1)).astype(np.float32)

    model = _torch_med3d_resnet10(torch, nn_t, sd)
    with torch.no_grad():
        ref = model(
            torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
        ).numpy()
    ref = np.transpose(ref, (0, 2, 3, 4, 1))  # NCDHW → NDHWC

    variables = load_torch_state_dict(sd)
    net = MedicalNetResNet10()
    got = np.asarray(
        jax.jit(lambda v, x: net.apply(v, x, train=False))(
            variables, jnp.asarray(x)
        )
    )
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=1e-3 * max(scale, 1.0))
