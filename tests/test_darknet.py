"""Darknet/YOLOv3: cfg parsing against the real yolov3.cfg, weights round-trip,
feature-cut semantics, and detection decode shapes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.models import darknet

YOLO_CFG = "/root/reference/data/yolo/yolov3.cfg"

TINY_CFG = """
[net]
height=32
width=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
filters=24
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326
classes=3
num=9
"""


@pytest.fixture
def tiny_cfg(tmp_path):
    p = tmp_path / "tiny.cfg"
    p.write_text(TINY_CFG)
    return str(p)


def test_parse_real_yolov3_cfg():
    if not os.path.exists(YOLO_CFG):
        pytest.skip("reference cfg not available")
    blocks = darknet.parse_cfg(YOLO_CFG)
    types = [b["type"] for b in blocks]
    assert types[0] == "net"
    # SURVEY.md §2 #15: 75 conv, 23 shortcut, 4 route, 2 upsample, 3 yolo
    assert types.count("convolutional") == 75
    assert types.count("shortcut") == 23
    assert types.count("route") == 4
    assert types.count("upsample") == 2
    assert types.count("yolo") == 3
    chain = darknet.build_filter_chain(blocks)
    assert len(chain) == len(blocks) - 1
    # detection heads emit 255 = 3*(5+80) channels
    assert chain[[b["type"] for b in blocks[1:]].index("yolo") - 1] == 255


def test_tiny_cfg_filter_chain(tiny_cfg):
    """Filter-chain bookkeeping through conv/shortcut/conv/yolo blocks."""
    blocks = darknet.parse_cfg(tiny_cfg)
    chain = darknet.build_filter_chain(blocks)
    assert chain == [8, 16, 16, 24, 24]


def test_cfg_parser_robustness(tmp_path):
    """Comments, blank lines, stray whitespace, values with '=' inside."""
    p = tmp_path / "messy.cfg"
    p.write_text(
        "# top comment\n\n[net]\n  height = 32  \nwidth=32\n\n"
        "# layer comment\n[convolutional]\nbatch_normalize=1\nfilters=8\n"
        "size=3\nstride=1\npad=1\nactivation=leaky\n\n")
    blocks = darknet.parse_cfg(str(p))
    assert [b["type"] for b in blocks] == ["net", "convolutional"]
    assert blocks[0]["height"] == "32"
    assert blocks[1]["filters"] == "8"


def test_weights_roundtrip(tiny_cfg, tmp_path):
    blocks = darknet.parse_cfg(tiny_cfg)
    params = darknet.init_params(jax.random.PRNGKey(0), blocks)
    # randomize bn stats so the roundtrip is a real test
    params[0]["bn"]["mean"] = jnp.asarray(np.random.randn(8).astype(np.float32))
    wfile = str(tmp_path / "w.weights")
    darknet.save_weights(params, blocks, wfile)
    params2 = darknet.init_params(jax.random.PRNGKey(1), blocks)
    params2, header = darknet.load_weights(params2, blocks, wfile)
    for p, q in zip(params, params2):
        if p is None:
            assert q is None
            continue
        np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(q["w"]))
        if "bn" in p:
            for k in p["bn"]:
                np.testing.assert_allclose(np.asarray(p["bn"][k]),
                                           np.asarray(q["bn"][k]))
        else:
            np.testing.assert_allclose(np.asarray(p["b"]), np.asarray(q["b"]))


def test_real_yolov3_get_feats_cut():
    """Build the full YOLOv3 graph from the reference cfg with random weights
    and check the bbox-feature cut: 13x13x1024 at 416 input (scaled here to a
    64-input -> 2x2 grid for CPU speed)."""
    if not os.path.exists(YOLO_CFG):
        pytest.skip("reference cfg not available")
    blocks = darknet.parse_cfg(YOLO_CFG)
    net = darknet.Darknet(YOLO_CFG, key=jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 3, 64, 64)).astype(np.float32))
    feats = net.get_feats(x, compute_dtype=jnp.float32)
    # stride-32 backbone: 64/32 = 2; the cut is 1024 channels (SURVEY.md §2 #15)
    assert feats.shape == (1, 1024, 2, 2)

    det = net.forward(x, compute_dtype=jnp.float32)
    # first head: grid 2x2, 3 anchors, 85 attrs
    assert det.shape == (1, 2 * 2 * 3, 85)
    det_all = net.forward_all_heads(x, compute_dtype=jnp.float32)
    # three heads at strides 32/16/8: 4+16+64 cells, x3 anchors
    assert det_all.shape == (1, (4 + 16 + 64) * 3, 85)


def test_reorg_matches_torch_reference_math():
    """reorg vs a torch replication of the reference ReOrgLayer view/transpose
    chain (darknet.py:183-195)."""
    torch = pytest.importorskip("torch")

    def torch_reorg(x, stride=2):
        B, C, H, W = x.shape
        hs = ws = stride
        x = x.view(B, C, H // hs, hs, W // ws, ws).transpose(-2, -3).contiguous()
        x = x.view(B, C, H // hs * W // ws, hs, ws)
        x = x.view(B, C, H // hs * W // ws, hs * ws).transpose(-1, -2).contiguous()
        x = x.view(B, C, ws * hs, H // ws, W // ws).transpose(1, 2).contiguous()
        return x.view(B, C * ws * hs, H // ws, W // ws)

    x = np.random.default_rng(0).standard_normal((2, 3, 4, 6)).astype(np.float32)
    want = torch_reorg(torch.tensor(x)).numpy()
    got = np.asarray(darknet.reorg(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_predict_transform_math():
    """Zero logits -> sigmoid=0.5 everywhere, wh = anchors, boxes*stride."""
    grid, na, nc, inp = 2, 2, 1, 8  # stride 4
    pred = jnp.zeros((1, na * (5 + nc), grid, grid))
    anchors = [(4, 8), (8, 4)]
    out = np.asarray(darknet.predict_transform(pred, inp, anchors, nc))
    assert out.shape == (1, grid * grid * na, 6)
    # first cell, first anchor: xy = (0.5+0)*stride = 2; wh = anchors
    np.testing.assert_allclose(out[0, 0, :4], [2.0, 2.0, 4.0, 8.0], atol=1e-5)
    np.testing.assert_allclose(out[0, 1, :4], [2.0, 2.0, 8.0, 4.0], atol=1e-5)
    # last cell (1,1): xy = (0.5+1)*4 = 6
    np.testing.assert_allclose(out[0, -1, :2], [6.0, 6.0], atol=1e-5)
    np.testing.assert_allclose(out[..., 4], 0.5, atol=1e-6)
