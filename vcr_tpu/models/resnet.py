"""ResNet-18/34 feature extractor in functional JAX (NCHW).

TPU-native replacement for the reference's torchvision backbone used in CNN
feature extraction (reference: data/extract_video_feats.py:88-95 — resnet18/34
with the final ``fc`` stripped, output = 512-d global-average-pooled features).

Weights: torchvision isn't bundled here, so ``load_torch_state_dict`` converts
a saved ``resnet{18,34}`` state_dict (torch .pth loaded via torch.load, or a
dict of numpy arrays) into this module's param tree. Random init is available
for tests/benchmarks.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# layers per stage
_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}
_STAGE_CH = (64, 128, 256, 512)


def _conv_init(key, out_ch, in_ch, k):
    fan_in = in_ch * k * k
    std = (2.0 / fan_in) ** 0.5  # he-normal (torchvision's kaiming init)
    return std * jax.random.normal(key, (out_ch, in_ch, k, k), jnp.float32)


def _bn_init(ch):
    return {"scale": jnp.ones((ch,), jnp.float32), "bias": jnp.zeros((ch,), jnp.float32),
            "mean": jnp.zeros((ch,), jnp.float32), "var": jnp.ones((ch,), jnp.float32)}


def init_params(key: jax.Array, arch: str = "resnet34") -> Dict:
    blocks = _BLOCKS[arch]
    keys = iter(jax.random.split(key, 2 + 3 * sum(blocks) + 4))
    params: Dict = {
        "conv1": _conv_init(next(keys), 64, 3, 7),
        "bn1": _bn_init(64),
        "layers": [],
    }
    in_ch = 64
    for stage, (n_blocks, ch) in enumerate(zip(blocks, _STAGE_CH)):
        stage_params: List[Dict] = []
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            blk = {
                "conv1": _conv_init(next(keys), ch, in_ch, 3),
                "bn1": _bn_init(ch),
                "conv2": _conv_init(next(keys), ch, ch, 3),
                "bn2": _bn_init(ch),
            }
            if stride != 1 or in_ch != ch:
                blk["downsample"] = {"conv": _conv_init(next(keys), ch, in_ch, 1),
                                     "bn": _bn_init(ch)}
            stage_params.append(blk)
            in_ch = ch
        params["layers"].append(stage_params)
    return params


def _conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return (x - p["mean"][None, :, None, None]) * inv[None, :, None, None] \
        + p["bias"][None, :, None, None]


def _basic_block(p, x, stride, cdtype=jnp.float32):
    # explicit torch-style padding: pad=1 both sides (XLA "SAME" pads
    # asymmetrically for stride 2, which would break torchvision weight parity)
    # x arrives in cdtype; conv outputs accumulate f32
    # (preferred_element_type) and _bn keeps f32 — cast back to cdtype before
    # the NEXT conv so every conv's MXU pass actually runs at compute_dtype
    # (f32 in, f32 weights = ~half MXU rate; fp32 parity mode is a no-op).
    pad1 = [(1, 1), (1, 1)]
    out = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], stride, pad1)))
    out = _bn(p["bn2"], _conv(out.astype(cdtype), p["conv2"], 1, pad1))
    if "downsample" in p:
        x = _bn(p["downsample"]["bn"], _conv(x, p["downsample"]["conv"], stride,
                                             [(0, 0), (0, 0)]))
    return jax.nn.relu(out + x).astype(cdtype)


def extract_features(params: Dict, images: jax.Array,
                     compute_dtype=jnp.bfloat16) -> jax.Array:
    """images (B, 3, H, W) ImageNet-normalized -> (B, 512) pooled features
    (the reference's model-with-fc-stripped output)."""
    x = images.astype(compute_dtype)
    x = jax.nn.relu(_bn(params["bn1"],
                        _conv(x, params["conv1"], 2, [(3, 3), (3, 3)])))
    # 3x3 max pool stride 2, padding 1
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                              [(0, 0), (0, 0), (1, 1), (1, 1)])
    x = x.astype(compute_dtype)
    for stage, stage_params in enumerate(params["layers"]):
        for b, blk in enumerate(stage_params):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = _basic_block(blk, x, stride, compute_dtype)
    return jnp.mean(x, axis=(2, 3)).astype(jnp.float32)  # global avg pool


def load_torch_state_dict(state_dict: Dict, arch: str = "resnet34") -> Dict:
    """Convert a torchvision resnet18/34 state_dict (tensors or numpy) into
    this module's param tree."""
    def g(name):
        v = state_dict[name]
        return jnp.asarray(np.asarray(v), dtype=jnp.float32)

    def bn(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias"),
                "mean": g(prefix + ".running_mean"), "var": g(prefix + ".running_var")}

    params: Dict = {"conv1": g("conv1.weight"), "bn1": bn("bn1"), "layers": []}
    for stage, n_blocks in enumerate(_BLOCKS[arch]):
        stage_params = []
        for b in range(n_blocks):
            pre = f"layer{stage + 1}.{b}"
            blk = {"conv1": g(pre + ".conv1.weight"), "bn1": bn(pre + ".bn1"),
                   "conv2": g(pre + ".conv2.weight"), "bn2": bn(pre + ".bn2")}
            if pre + ".downsample.0.weight" in state_dict:
                blk["downsample"] = {"conv": g(pre + ".downsample.0.weight"),
                                     "bn": bn(pre + ".downsample.1")}
            stage_params.append(blk)
        params["layers"].append(stage_params)
    return params
