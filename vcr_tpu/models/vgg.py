"""VGG16 fc7 featurizer in functional JAX (NCHW).

The reference's MSVD-VGG corpus consumes *downloaded* VGG16 fc7 features
(data/msvd_vgg/get_data.sh, repackaged by data/msvd_vgg/extract_video_feats.py)
— the 4096-d vectors its captioners train on (args.py:28 vid_feat_size=4096).
This module makes the featurizer itself TPU-native (BASELINE.json north star:
"the VGG16/darknet featurizers ... become batched Pallas/XLA kernels"), so
fresh videos can be featurized on-device: conv stack -> fc6 -> ReLU -> fc7,
returning the 4096-d fc7 activations.

Weights convert from a torchvision vgg16 state_dict. Inference only.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 'D' configuration: conv channel plan, 'M' = 2x2 maxpool
_CFG: List = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


def init_params(key: jax.Array) -> Dict:
    params: Dict = {"convs": [], "fc6": None, "fc7": None}
    in_ch = 3
    keys = iter(jax.random.split(key, len(_CFG) + 2))
    for v in _CFG:
        if v == "M":
            continue
        fan_in = in_ch * 9
        w = ((2.0 / fan_in) ** 0.5) * jax.random.normal(
            next(keys), (v, in_ch, 3, 3), jnp.float32)
        params["convs"].append({"w": w, "b": jnp.zeros((v,), jnp.float32)})
        in_ch = v
    k6, k7 = next(keys), next(keys)
    params["fc6"] = {"w": 0.01 * jax.random.normal(k6, (512 * 7 * 7, 4096)),
                     "b": jnp.zeros((4096,), jnp.float32)}
    params["fc7"] = {"w": 0.01 * jax.random.normal(k7, (4096, 4096)),
                     "b": jnp.zeros((4096,), jnp.float32)}
    return params


def extract_fc7(params: Dict, images: jax.Array,
                compute_dtype=jnp.bfloat16) -> jax.Array:
    """images (B, 3, 224, 224) ImageNet-normalized -> (B, 4096) fc7 (post-ReLU
    fc6, pre-activation fc7, matching the downloaded yt_allframes_vgg_fc7_*
    feature convention)."""
    x = images.astype(compute_dtype)
    ci = 0
    for v in _CFG:
        if v == "M":
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            continue
        p = params["convs"][ci]
        ci += 1
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(compute_dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        x = jax.nn.relu(x + p["b"][None, :, None, None]).astype(compute_dtype)
    b = x.shape[0]
    x = x.reshape(b, -1)  # (B, 512*7*7), NCHW flatten == torch's
    x = jax.nn.relu(jnp.dot(x, params["fc6"]["w"].astype(compute_dtype),
                            preferred_element_type=jnp.float32)
                    + params["fc6"]["b"])
    x = jnp.dot(x.astype(compute_dtype), params["fc7"]["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32) + params["fc7"]["b"]
    return x


def load_torch_state_dict(sd: Dict) -> Dict:
    """torchvision vgg16 state_dict -> param tree. features.{i}.weight are the
    convs in _CFG order; classifier.0 = fc6, classifier.3 = fc7."""
    def g(name):
        v = sd[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    params: Dict = {"convs": []}
    layer_idx = 0
    for v in _CFG:
        if v == "M":
            layer_idx += 1
            continue
        params["convs"].append({"w": g(f"features.{layer_idx}.weight"),
                                "b": g(f"features.{layer_idx}.bias")})
        layer_idx += 2  # conv + relu
    params["fc6"] = {"w": g("classifier.0.weight").T, "b": g("classifier.0.bias")}
    params["fc7"] = {"w": g("classifier.3.weight").T, "b": g("classifier.3.bias")}
    return params
