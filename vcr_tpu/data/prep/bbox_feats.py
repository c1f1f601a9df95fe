"""Offline YOLO grid-feature extraction: clips -> bbox_feats/<vid>.npy.

Reference: data/extract_bbox_feats.py:61-106 — cv2 decode -> letterbox to
img_size (asserted multiple of 32 and > 32) -> linspace subsample ->
Darknet.get_feats (the 13x13x1024 cut) -> save (N, F, K, K) per clip. Here the
frames of a clip go through the JAX Darknet as ONE batched jitted call.
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from vcr_tpu.data.prep import frames as F


def extract_bbox_feats(cfg) -> None:
    import jax
    import jax.numpy as jnp

    from vcr_tpu.models.darknet import Darknet

    corpus_dir = os.path.join(cfg.data_dir, cfg.corpus)
    clips_dir = os.path.join(corpus_dir, "clips/")
    ext = {"msvd": ".avi", "msrvtt": ".mp4"}.get(cfg.corpus)
    if ext is None:
        raise NotImplementedError("unknown corpus")
    clips = [f for f in os.listdir(clips_dir) if f.endswith(ext)]
    feats_dir = os.path.join(corpus_dir, "bbox_feats/")
    if os.path.exists(feats_dir):
        shutil.rmtree(feats_dir)
    os.makedirs(feats_dir)

    print("Loading network.....")
    net = Darknet(os.path.join(cfg.data_dir, "yolo/", "yolov3.cfg"))
    weights = os.path.join(cfg.data_dir, "yolo/", "yolov3.weights")
    if os.path.exists(weights):
        net.load_weights(weights)
    else:
        print("WARNING: yolov3.weights not found — extracting with random init")
    net.net_info["height"] = cfg.img_size
    print("Network successfully loaded")
    assert cfg.img_size % 32 == 0 and cfg.img_size > 32  # extract_bbox_feats.py:82-83

    # params are a jit ARGUMENT (closing over them would bake ~240 MB of
    # YOLO weights into the lowered program as constants — the documented
    # constant-folding/upload trap, serving.py bottom note), and the frame
    # batch is padded to a FIXED num_frames so short clips don't force one
    # recompile per distinct length (CLAUDE.md: fixed shapes everywhere).
    @jax.jit
    def featurize(params, images):
        return net.get_feats(images, compute_dtype=jnp.bfloat16, params=params)

    for video in clips:
        base = os.path.splitext(video)[0]
        raw = F.decode_frames(os.path.join(clips_dir, video))
        idxs = F.subsample_indices(len(raw), cfg.num_frames)
        batch = np.stack([F.prep_image_yolo(raw[i], cfg.img_size)[0] for i in idxs])
        n = batch.shape[0]
        if n < cfg.num_frames:
            batch = np.concatenate(
                [batch, np.zeros((cfg.num_frames - n, *batch.shape[1:]),
                                 batch.dtype)])
        feats = np.asarray(featurize(net.params, batch))[:n]
        np.save(os.path.join(feats_dir, base + ".npy"), feats)
