"""Spatial-attention heatmap video export.

Reference: eval_attention.py:29-148 — loads a trained SpatialNet checkpoint
(rebuilding the model from the checkpoint's embedded config), runs the forward
on the precomputed bbox features of a clip, nearest-upsamples the per-frame
K x K attention maps to img_size, min-max normalizes them into [0.5, 1], darkens
each letterboxed frame by its map, and writes an mp4 at 2 fps.
"""

from __future__ import annotations

import os
import shutil
from typing import List

import jax
import numpy as np

from vcr_tpu.config import Config
from vcr_tpu.data.prep import frames as F
from vcr_tpu.models import base as model_base
from vcr_tpu.models import spatial
from vcr_tpu.train import checkpoint as ckpt
from vcr_tpu.vocab import Vocab

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _load_feats_padded(path: str, num_frames: int) -> np.ndarray:
    """(1, num_frames, ...) float32 — the runtime pipeline's zero-pad/
    truncate rule (data/pipeline.py load_features), one home for both
    exporters so maps always match what the model saw."""
    feats = np.load(path)[None]
    if feats.shape[1] < num_frames:
        pad = np.zeros((1, num_frames - feats.shape[1], *feats.shape[2:]),
                       feats.dtype)
        feats = np.concatenate([feats, pad], axis=1)
    return feats[:, :num_frames].astype(np.float32)

def load_spatial_net(spatial_net_file: str, data_dir: str):
    """Rebuild SpatialNet purely from a checkpoint (eval_attention.py:77-91):
    the embedded config supplies every hyperparameter."""
    params, _, meta = ckpt.load_checkpoint(spatial_net_file)
    cfg = Config.from_dict(meta["config"])
    vocab = Vocab(os.path.join(data_dir, cfg.corpus, "glove", cfg.glove_emb_file),
                  seed=cfg.seed)
    spec = model_base.spec_from_config(cfg, vocab).with_(arch="spatial")
    # orbax returns plain nested dicts of arrays — exactly our param format
    return params, spec, cfg, vocab


def compute_seq_alphas(params, spec, vid_feats: np.ndarray) -> np.ndarray:
    """(1, N, F, K, K) features -> (N, K, K) attention maps (eval mode)."""
    _, seq_alphas, _ = spatial.apply(params, spec, vid_feats, train=False)
    return np.asarray(seq_alphas)[0]


def export_video(params, spec, cfg, clips_dir: str, bbox_feats_dir: str,
                 vid_file: str, out_dir: str) -> str:
    """One clip -> attention-overlay mp4 (eval_attention.py:93-117)."""
    assert cv2 is not None, "cv2 required for video export"
    vid_path = os.path.join(clips_dir, vid_file)
    raw = F.decode_frames(vid_path)
    idxs = F.subsample_indices(len(raw), cfg.num_frames)
    frame_list = [raw[i] for i in idxs]
    base = os.path.splitext(os.path.basename(vid_file))[0]

    vid_feats = _load_feats_padded(
        os.path.join(bbox_feats_dir, base + ".npy"), cfg.num_frames)

    seq_alphas = compute_seq_alphas(params, spec, vid_feats)
    grid = seq_alphas.shape[1]
    n = cfg.img_size // grid
    seq_alphas = seq_alphas.repeat(n, axis=1).repeat(n, axis=2)

    out_path = os.path.join(out_dir, base + ".mp4")
    writer = cv2.VideoWriter(out_path, 0x7634706D, 2,
                             (cfg.img_size, cfg.img_size))
    for i, frame in enumerate(frame_list):
        _, canvas = F.prep_image_yolo(frame, cfg.img_size)
        att = seq_alphas[i]
        att = (att - att.min()) / max(att.max() - att.min(), 1e-12)
        att = att / 2.0 + 0.5  # [0.5, 1] (eval_attention.py:110-111)
        img = canvas * att[:, :, None]
        writer.write(np.uint8(img))
    writer.release()
    return out_path


def export_rationale_video(params, spec, cfg, clips_dir: str, feats_dir: str,
                           vid_file: str, out_dir: str) -> str:
    """Temporal-rationale overlay: darken frames the Gumbel generator did NOT
    select (hard eval selection, RationaleNet.py:49-53). The temporal analogue
    of the spatial heatmap export — new capability (the reference only
    visualized spatial attention)."""
    assert cv2 is not None, "cv2 required for video export"
    import jax

    from vcr_tpu.models import rationale

    raw = F.decode_frames(os.path.join(clips_dir, vid_file))
    idxs = F.subsample_indices(len(raw), cfg.num_frames)
    frame_list = [raw[i] for i in idxs]
    base = os.path.splitext(os.path.basename(vid_file))[0]

    vid_feats = _load_feats_padded(
        os.path.join(feats_dir, base + ".npy"), cfg.num_frames)

    _, probs = rationale.apply(params, spec, vid_feats,
                               rng=jax.random.PRNGKey(cfg.seed), train=False)
    selected = np.asarray(probs)[0, :, 1]  # hard 0/1 at eval

    out_path = os.path.join(out_dir, base + "_rationale.mp4")
    writer = cv2.VideoWriter(out_path, 0x7634706D, 2,
                             (cfg.img_size, cfg.img_size))
    for i, frame in enumerate(frame_list):
        _, canvas = F.prep_image_yolo(frame, cfg.img_size)
        weight = 1.0 if (i < len(selected) and selected[i] > 0.5) else 0.25
        writer.write(np.uint8(canvas * weight))
    writer.release()
    return out_path


def run_export(cfg: Config) -> List[str]:
    """CLI entry (eval_attention.py:119-148): single clip or --all."""
    params, spec, saved_cfg, _ = load_spatial_net(cfg.spatial_net_file, cfg.data_dir)
    corpus_dir = os.path.join(cfg.data_dir, cfg.corpus)
    clips_dir = os.path.join(corpus_dir, "clips/")
    bbox_dir = os.path.join(corpus_dir, "bbox_feats/")
    out_dir = os.path.join(corpus_dir, "out_clips/")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    if not cfg.export_all:
        return [export_video(params, spec, saved_cfg, clips_dir, bbox_dir,
                             cfg.vid_file, out_dir)]
    ext = {"msvd": ".avi", "msrvtt": ".mp4"}.get(cfg.corpus)
    if ext is None:
        raise NotImplementedError("unknown corpus")
    outs = []
    for video in sorted(f for f in os.listdir(clips_dir) if f.endswith(ext)):
        outs.append(export_video(params, spec, saved_cfg, clips_dir, bbox_dir,
                                 video, out_dir))
    return outs
