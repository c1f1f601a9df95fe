"""Darknet / YOLOv3 in functional JAX: cfg-driven graph builder, binary
.weights reader/writer, detection forward, and the feature-extraction cut.

TPU-native rebuild of reference model/darknet.py:

* cfg DSL parser -> list of block dicts (darknet.py:93-122)
* graph builder tracking the filter chain through convolutional / route /
  shortcut / upsample / maxpool / yolo blocks (darknet.py:198-342)
* binary ``yolov3.weights`` loader: sequential float32 pointer walk, per conv
  block [bn_bias, bn_scale, bn_mean, bn_var] then conv weights (OIHW order),
  or [conv_bias, conv_weights] without BN (darknet.py:467-552); saver is the
  inverse (darknet.py:554-599)
* ``forward``: dict-of-activations trace with route concat / shortcut add /
  nearest-2x upsample, yolo heads decoded by ``predict_transform``
  (sigmoid xy/obj/cls, exp wh * anchors, grid offsets, x stride —
  darknet.py:16-69, 388-457; note the reference returns at the FIRST yolo
  head — replicated in forward(), full 3-head decode available via
  ``forward_all_heads``)
* ``get_feats``: run the backbone and return outputs[i-2] at the first yolo
  head — the 13x13x1024 map two layers before detection (darknet.py:362-386)

All convs run in one jitted trace; BN is inference-mode (the reference calls
model.eval() before extraction, data/extract_bbox_feats.py:87).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- cfg parsing

def parse_cfg(cfgfile: str) -> List[Dict]:
    """cfg DSL -> list of block dicts (first block is [net] info)."""
    blocks: List[Dict] = []
    block: Dict = {}
    with open(cfgfile) as f:
        for raw in f.read().split("\n"):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith("["):
                if block:
                    blocks.append(block)
                    block = {}
                block["type"] = line[1:-1].strip()
            else:
                key, value = line.split("=", 1)
                block[key.strip()] = value.strip()
    if block:
        blocks.append(block)
    return blocks


def _conv_meta(block: Dict) -> Tuple[int, int, int, int, bool]:
    filters = int(block["filters"])
    ksize = int(block["size"])
    stride = int(block["stride"])
    pad = (ksize - 1) // 2 if int(block["pad"]) else 0
    has_bn = int(block.get("batch_normalize", 0)) == 1
    return filters, ksize, stride, pad, has_bn


def build_filter_chain(blocks: List[Dict]) -> List[int]:
    """Output channel count per layer (mirrors create_modules' bookkeeping,
    darknet.py:206-338)."""
    out: List[int] = []
    prev = 3
    for index, b in enumerate(blocks[1:]):
        t = b["type"]
        if t == "convolutional":
            prev = int(b["filters"])
        elif t == "route":
            layers = [int(a) for a in str(b["layers"]).split(",")]
            layers = [l - index if l > 0 else l for l in layers]
            if len(layers) == 1:
                prev = out[index + layers[0]]
            else:
                prev = out[index + layers[0]] + out[index + layers[1]]
        elif t == "reorg":
            prev = prev * int(b.get("stride", 2)) ** 2
        elif t in ("shortcut", "upsample", "maxpool", "yolo"):
            pass  # channel count unchanged
        else:
            raise ValueError(f"unknown block type {t!r}")
        out.append(prev)
    return out


# ---------------------------------------------------------------- params

def init_params(key: jax.Array, blocks: List[Dict]) -> List[Optional[Dict]]:
    """One entry per layer: conv layers get {'w' (O,I,k,k), 'b'} or
    {'w', 'bn': {scale,bias,mean,var}}; non-conv layers get None."""
    chain = build_filter_chain(blocks)
    params: List[Optional[Dict]] = []
    prev = 3
    keys = iter(jax.random.split(key, len(blocks)))
    for index, b in enumerate(blocks[1:]):
        if b["type"] == "convolutional":
            filters, ksize, _, _, has_bn = _conv_meta(b)
            fan_in = prev * ksize * ksize
            w = ((2.0 / fan_in) ** 0.5) * jax.random.normal(
                next(keys), (filters, prev, ksize, ksize), jnp.float32)
            if has_bn:
                p = {"w": w, "bn": {
                    "scale": jnp.ones((filters,), jnp.float32),
                    "bias": jnp.zeros((filters,), jnp.float32),
                    "mean": jnp.zeros((filters,), jnp.float32),
                    "var": jnp.ones((filters,), jnp.float32)}}
            else:
                p = {"w": w, "b": jnp.zeros((filters,), jnp.float32)}
            params.append(p)
        else:
            params.append(None)
        prev = chain[index]
    return params


# ---------------------------------------------------------------- weights IO

def load_weights(params: List[Optional[Dict]], blocks: List[Dict],
                 weightfile: str) -> Tuple[List[Optional[Dict]], np.ndarray]:
    """Binary darknet .weights -> params. Returns (params, header). The
    5-int32 header is [major, minor, subversion, images_seen, _]
    (darknet.py:470-483)."""
    with open(weightfile, "rb") as fp:
        header = np.fromfile(fp, dtype=np.int32, count=5)
        weights = np.fromfile(fp, dtype=np.float32)

    ptr = 0

    def take(n, shape):
        nonlocal ptr
        out = weights[ptr:ptr + n].reshape(shape)
        ptr += n
        return jnp.asarray(out)

    new_params = list(params)
    for i, b in enumerate(blocks[1:]):
        if b["type"] != "convolutional":
            continue
        p = dict(params[i])
        o = p["w"].shape[0]
        if "bn" in p:
            bn = {}
            bn["bias"] = take(o, (o,))
            bn["scale"] = take(o, (o,))
            bn["mean"] = take(o, (o,))
            bn["var"] = take(o, (o,))
            p["bn"] = bn
        else:
            p["b"] = take(o, (o,))
        p["w"] = take(int(np.prod(p["w"].shape)), p["w"].shape)
        new_params[i] = p
    assert ptr == len(weights), f"weight file mismatch: used {ptr} of {len(weights)}"
    return new_params, header


def save_weights(params: List[Optional[Dict]], blocks: List[Dict],
                 savedfile: str, header: Optional[np.ndarray] = None) -> None:
    """Inverse of load_weights (darknet.py:554-599)."""
    if header is None:
        header = np.zeros(5, dtype=np.int32)
    with open(savedfile, "wb") as fp:
        np.asarray(header, dtype=np.int32).tofile(fp)
        for i, b in enumerate(blocks[1:]):
            if b["type"] != "convolutional":
                continue
            p = params[i]
            if "bn" in p:
                for k in ("bias", "scale", "mean", "var"):
                    np.asarray(p["bn"][k], np.float32).tofile(fp)
            else:
                np.asarray(p["b"], np.float32).tofile(fp)
            np.asarray(p["w"], np.float32).tofile(fp)


# ---------------------------------------------------------------- forward

def _conv_block(p: Dict, block: Dict, x: jax.Array, cdtype) -> jax.Array:
    _, ksize, stride, pad, has_bn = _conv_meta(block)
    y = jax.lax.conv_general_dilated(
        x.astype(cdtype), p["w"].astype(cdtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    if has_bn:
        bn = p["bn"]
        inv = jax.lax.rsqrt(bn["var"] + 1e-5) * bn["scale"]
        y = (y - bn["mean"][None, :, None, None]) * inv[None, :, None, None] \
            + bn["bias"][None, :, None, None]
    else:
        y = y + p["b"][None, :, None, None]
    if block["activation"] == "leaky":
        y = jnp.where(y > 0, y, 0.1 * y)
    return y


def _upsample2(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x (darknet.py:260 uses nn.Upsample(2, 'nearest'))."""
    b, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (b, c, h, 2, w, 2))
    return x.reshape(b, c, 2 * h, 2 * w)


def reorg(x: jax.Array, stride: int = 2) -> jax.Array:
    """Space-to-depth ReOrg (darknet.py:178-195; vestigial in yolov3.cfg but
    part of the cfg dialect — kept for cfg files that use it). Matches the
    reference's channel ordering: (B, C, H, W) -> (B, C*s*s, H/s, W/s) with the
    s*s spatial phases becoming the leading channel factor."""
    b, c, h, w = x.shape
    hs = ws = stride
    assert h % hs == 0 and w % ws == 0
    x = x.reshape(b, c, h // hs, hs, w // ws, ws).transpose(0, 1, 2, 4, 3, 5)
    x = x.reshape(b, c, (h // hs) * (w // ws), hs * ws).transpose(0, 1, 3, 2)
    x = x.reshape(b, c, ws * hs, h // ws, w // ws).transpose(0, 2, 1, 3, 4)
    return x.reshape(b, c * ws * hs, h // ws, w // ws)


def _maxpool(x: jax.Array, size: int, stride: int) -> jax.Array:
    if stride != 1:
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 1, size, size), (1, 1, stride, stride),
                                     "VALID")
    # MaxPoolStride1: replicate-pad right/bottom by size-1 (darknet.py:127-136)
    pad = size - 1
    x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, pad)), mode="edge")
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, size, size), (1, 1, 1, 1), "VALID")


def predict_transform(prediction: jax.Array, inp_dim: int,
                      anchors: List[Tuple[int, int]], num_classes: int) -> jax.Array:
    """Decode one yolo head (darknet.py:16-69): (B, A*(5+C), G, G) ->
    (B, G*G*A, 5+C) with sigmoid xy/obj/cls, grid offsets, exp-wh * anchors,
    boxes scaled back by stride."""
    b = prediction.shape[0]
    grid = prediction.shape[2]
    stride = inp_dim // grid
    na = len(anchors)
    attrs = 5 + num_classes
    scaled_anchors = jnp.asarray([(a[0] / stride, a[1] / stride) for a in anchors],
                                 jnp.float32)

    pred = prediction.reshape(b, na * attrs, grid * grid)
    pred = jnp.transpose(pred, (0, 2, 1)).reshape(b, grid * grid * na, attrs)

    xy = jax.nn.sigmoid(pred[:, :, 0:2])
    obj = jax.nn.sigmoid(pred[:, :, 4:5])
    cls = jax.nn.sigmoid(pred[:, :, 5:])

    gx, gy = np.meshgrid(np.arange(grid), np.arange(grid))
    offsets = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)  # (G*G, 2)
    offsets = np.repeat(offsets, na, axis=0)[None]                 # (1, G*G*A, 2)
    xy = xy + jnp.asarray(offsets, jnp.float32)

    anchor_grid = jnp.tile(scaled_anchors, (grid * grid, 1))[None]
    wh = jnp.exp(pred[:, :, 2:4]) * anchor_grid

    boxes = jnp.concatenate([xy, wh], axis=2) * stride
    return jnp.concatenate([boxes, obj, cls], axis=2)


class Darknet:
    """cfg-driven YOLOv3 graph. Thin stateful wrapper over pure functions
    (params live in .params; all compute paths are jittable)."""

    def __init__(self, cfgfile: str, key: Optional[jax.Array] = None):
        self.blocks = parse_cfg(cfgfile)
        self.net_info = self.blocks[0]
        self.filter_chain = build_filter_chain(self.blocks)
        self.params = init_params(key if key is not None else jax.random.PRNGKey(0),
                                  self.blocks)
        self.header = np.zeros(5, dtype=np.int32)

    def load_weights(self, weightfile: str) -> None:
        self.params, self.header = load_weights(self.params, self.blocks, weightfile)

    def save_weights(self, savedfile: str) -> None:
        save_weights(self.params, self.blocks, savedfile, self.header)

    # ---- trace over the layer graph ----
    def _trace(self, params, x, cdtype, stop_at_first_yolo: bool):
        """Returns (detections list, outputs dict, first_yolo_index)."""
        outputs: Dict[int, jax.Array] = {}
        detections = []
        first_yolo = None
        for i, b in enumerate(self.blocks[1:]):
            t = b["type"]
            if t == "convolutional":
                x = _conv_block(params[i], b, x, cdtype)
            elif t == "upsample":
                x = _upsample2(x)
            elif t == "maxpool":
                x = _maxpool(x, int(b["size"]), int(b["stride"]))
            elif t == "route":
                layers = [int(a) for a in str(b["layers"]).split(",")]
                layers = [l - i if l > 0 else l for l in layers]
                if len(layers) == 1:
                    x = outputs[i + layers[0]]
                else:
                    x = jnp.concatenate([outputs[i + layers[0]],
                                         outputs[i + layers[1]]], axis=1)
            elif t == "reorg":
                x = reorg(x, int(b.get("stride", 2)))
            elif t == "shortcut":
                x = outputs[i - 1] + outputs[i + int(b["from"])]
            elif t == "yolo":
                if first_yolo is None:
                    first_yolo = i
                mask = [int(m) for m in b["mask"].split(",")]
                aflat = [int(a) for a in b["anchors"].split(",")]
                anchors = [(aflat[2 * j], aflat[2 * j + 1]) for j in mask]
                det = predict_transform(x, int(self.net_info["height"]), anchors,
                                        int(b["classes"]))
                detections.append(det)
                x = outputs[i - 1]  # darknet.py:456
                if stop_at_first_yolo:
                    outputs[i] = x
                    break
            outputs[i] = x
        return detections, outputs, first_yolo

    def forward(self, x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
        """Reference-parity forward: detections of the FIRST yolo head only
        (darknet.py:457 returns inside the first yolo block)."""
        dets, _, _ = self._trace(self.params, x, compute_dtype, True)
        return dets[0]

    def forward_all_heads(self, x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
        """Full 3-head YOLOv3 detection output (B, sum_heads G*G*3, 85)."""
        dets, _, _ = self._trace(self.params, x, compute_dtype, False)
        return jnp.concatenate(dets, axis=1)

    def get_feats(self, x: jax.Array, compute_dtype=jnp.bfloat16,
                  params=None) -> jax.Array:
        """The bbox-feature cut: outputs[first_yolo - 2] — the 13x13 map two
        layers before the first detection head (darknet.py:362-386).

        Pass ``params`` explicitly when calling under jit so the ~240 MB of
        YOLO weights are a traced ARGUMENT rather than baked-in constants
        (see data/prep/bbox_feats.py)."""
        _, outputs, first_yolo = self._trace(
            self.params if params is None else params, x, compute_dtype, True)
        assert first_yolo is not None, "cfg has no yolo block"
        return outputs[first_yolo - 2]
