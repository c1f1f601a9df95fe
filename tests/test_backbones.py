"""ResNet / VGG16 backbone shape tests + torch state_dict conversion parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.models import resnet, vgg


def test_resnet18_shapes(rng):
    params = resnet.init_params(jax.random.PRNGKey(0), "resnet18")
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
    feats = resnet.extract_features(params, x, compute_dtype=jnp.float32)
    assert feats.shape == (2, 512)
    assert np.isfinite(np.asarray(feats)).all()


def test_resnet_matches_torchvision_structure(rng):
    """Build a torch resnet18-like state_dict from torch modules and verify
    conversion + numerical parity of one basic block."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    # a single torch BasicBlock with downsample, checked against ours
    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(4, 8, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(8)
            self.conv2 = nn.Conv2d(8, 8, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(8)
            self.downsample = nn.Sequential(nn.Conv2d(4, 8, 1, 2, bias=False),
                                            nn.BatchNorm2d(8))

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + self.downsample(x))

    tb = Block().eval()
    # randomize bn stats for a real test
    with torch.no_grad():
        tb.bn1.running_mean.normal_()
        tb.bn2.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    blk = {"conv1": jnp.asarray(sd["conv1.weight"]),
           "bn1": {"scale": jnp.asarray(sd["bn1.weight"]),
                   "bias": jnp.asarray(sd["bn1.bias"]),
                   "mean": jnp.asarray(sd["bn1.running_mean"]),
                   "var": jnp.asarray(sd["bn1.running_var"])},
           "conv2": jnp.asarray(sd["conv2.weight"]),
           "bn2": {"scale": jnp.asarray(sd["bn2.weight"]),
                   "bias": jnp.asarray(sd["bn2.bias"]),
                   "mean": jnp.asarray(sd["bn2.running_mean"]),
                   "var": jnp.asarray(sd["bn2.running_var"])},
           "downsample": {"conv": jnp.asarray(sd["downsample.0.weight"]),
                          "bn": {"scale": jnp.asarray(sd["downsample.1.weight"]),
                                 "bias": jnp.asarray(sd["downsample.1.bias"]),
                                 "mean": jnp.asarray(sd["downsample.1.running_mean"]),
                                 "var": jnp.asarray(sd["downsample.1.running_var"])}}}
    x = np.random.default_rng(0).standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.tensor(x)).numpy()
    got = np.asarray(resnet._basic_block(blk, jnp.asarray(x), stride=2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_vgg_fc7_shapes(rng):
    params = vgg.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 3, 224, 224)).astype(np.float32))
    feats = vgg.extract_fc7(params, x, compute_dtype=jnp.float32)
    assert feats.shape == (2, 4096)
    assert np.isfinite(np.asarray(feats)).all()


def test_vgg_torch_conversion_layout():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    # minimal state_dict with torchvision vgg16 key layout
    sd = {}
    layer_idx = 0
    in_ch = 3
    for v in vgg._CFG:
        if v == "M":
            layer_idx += 1
            continue
        sd[f"features.{layer_idx}.weight"] = torch.randn(v, in_ch, 3, 3)
        sd[f"features.{layer_idx}.bias"] = torch.randn(v)
        in_ch = v
        layer_idx += 2
    sd["classifier.0.weight"] = torch.randn(4096, 512 * 7 * 7)
    sd["classifier.0.bias"] = torch.randn(4096)
    sd["classifier.3.weight"] = torch.randn(4096, 4096)
    sd["classifier.3.bias"] = torch.randn(4096)
    params = vgg.load_torch_state_dict(sd)
    assert len(params["convs"]) == 13
    assert params["fc6"]["w"].shape == (512 * 7 * 7, 4096)
    assert params["fc7"]["w"].shape == (4096, 4096)
