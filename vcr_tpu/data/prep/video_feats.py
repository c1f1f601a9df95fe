"""Offline CNN feature extraction: clips -> feats/<vid>.npy.

TPU-native version of the reference extractors:
* resnet18/34 path (data/extract_video_feats.py:71-120): cv2 decode ->
  resize/crop/normalize -> linspace subsample -> batched JAX ResNet forward
  (one jitted call per clip; frames are batched, not looped).
* MSVD-VGG repackager (data/msvd_vgg/extract_video_feats.py:14-53): parses the
  downloaded yt_allframes_vgg_fc7_* CSVs (4096-d fc7 rows keyed vidN_frame_M,
  asserting 4097 columns), sorts frames, linspace-subsamples, saves
  feats/<vid>.npy.
"""

from __future__ import annotations

import csv
import glob
import os
import re
import shutil

import numpy as np

from vcr_tpu.data.prep import frames as F


def extract_video_feats(cfg, resnet_params=None) -> None:
    """CNN features for msvd/msrvtt clips via the JAX ResNet.

    resnet_params: converted torchvision weights
    (vcr_tpu.models.resnet.load_torch_state_dict); pass a path to a .npz/.pth
    via cfg.pretrained_base or provide the tree directly. Random init (clearly
    warned) otherwise — architecture and pipeline stay exercisable offline.
    """
    import jax
    import jax.numpy as jnp

    from vcr_tpu.models import resnet

    corpus_dir = os.path.join(cfg.data_dir, cfg.corpus)
    clips_dir = os.path.join(corpus_dir, "clips/")
    ext = {"msvd": ".avi", "msrvtt": ".mp4"}.get(cfg.corpus)
    if ext is None:
        raise NotImplementedError("unknown corpus")
    clips = [f for f in os.listdir(clips_dir) if f.endswith(ext)]
    feats_dir = os.path.join(corpus_dir, "feats/")
    if os.path.exists(feats_dir):
        shutil.rmtree(feats_dir)
    os.makedirs(feats_dir)

    if cfg.vision_arch not in ("resnet18", "resnet34"):
        raise NotImplementedError("unknown vision architecture")
    if resnet_params is None:
        sd_path = getattr(cfg, "pretrained_base", None)
        if sd_path and os.path.exists(sd_path):
            import torch

            sd = torch.load(sd_path, map_location="cpu")
            resnet_params = resnet.load_torch_state_dict(sd, cfg.vision_arch)
        else:
            print("WARNING: no pretrained ResNet weights supplied — "
                  "extracting with random init")
            resnet_params = resnet.init_params(jax.random.PRNGKey(cfg.seed),
                                               cfg.vision_arch)

    # params as a jit ARGUMENT + fixed num_frames batch shape — see the
    # twin comment in bbox_feats.py (constant-folding trap / per-length
    # recompiles)
    @jax.jit
    def featurize(params, images):
        return resnet.extract_features(params, images,
                                       compute_dtype=jnp.bfloat16)

    for video in clips:
        base = os.path.splitext(video)[0]
        raw = F.decode_frames(os.path.join(clips_dir, video))
        idxs = F.subsample_indices(len(raw), cfg.num_frames)
        batch = np.stack([F.preprocess_frame_cnn(raw[i], cfg.img_size)
                          for i in idxs])
        n = batch.shape[0]
        if n < cfg.num_frames:
            batch = np.concatenate(
                [batch, np.zeros((cfg.num_frames - n, *batch.shape[1:]),
                                 batch.dtype)])
        feats = np.asarray(featurize(resnet_params, batch))[:n]
        np.save(os.path.join(feats_dir, base + ".npy"), feats)


_VID_RE = re.compile(r"(vid\d+)_frame_(\d+)")


def extract_video_feats_msvd_vgg(cfg) -> None:
    """Repackage the downloaded VGG fc7 CSVs into per-video .npy files."""
    corpus_dir = os.path.join(cfg.data_dir, cfg.corpus)
    files = glob.glob(os.path.join(corpus_dir, "yt_allframes_vgg_fc7_*"))
    feats_dir = os.path.join(corpus_dir, "feats/")
    if os.path.exists(feats_dir):
        shutil.rmtree(feats_dir)
    os.makedirs(feats_dir)

    for path in files:
        per_video = {}
        with open(path) as fp:
            for row in csv.reader(fp, delimiter=","):
                assert len(row) == 4097  # msvd_vgg/extract_video_feats.py:33
                m = _VID_RE.match(row[0])
                vid, frame_num = m.group(1), int(m.group(2))
                feat = np.asarray([float(x) for x in row[1:]], dtype=np.float32)
                per_video.setdefault(vid, []).append((frame_num, feat))

        for vid, frames in per_video.items():
            frames.sort(key=lambda t: t[0])
            arr = np.stack([f[1] for f in frames])
            idxs = F.subsample_indices(len(arr), cfg.num_frames)
            np.save(os.path.join(feats_dir, vid + ".npy"), arr[idxs])
