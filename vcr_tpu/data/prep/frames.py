"""Frame decoding and preprocessing (host-side, cv2).

Reference parity:
* CNN path: aspect-preserving resize + center-crop to img_size, ImageNet
  normalization (data/extract_video_feats.py:23-54)
* YOLO path: letterbox to img_size with 128-gray padding, BGR->RGB, /255
  (data/extract_bbox_feats.py:23-48)
* linspace frame subsampling to num_frames with endpoint=False
  (data/extract_video_feats.py:109-112 et al.)
"""

from __future__ import annotations

from typing import List

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def decode_frames(video_file: str) -> List[np.ndarray]:
    """All frames of a clip as BGR uint8 arrays."""
    assert cv2 is not None, "cv2 required for video decode"
    cap = cv2.VideoCapture(video_file)
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame)
    cap.release()
    return frames


def subsample_indices(n_frames: int, num_frames: int) -> np.ndarray:
    """linspace subsample (endpoint=False), identity if short."""
    if n_frames > num_frames:
        return np.linspace(0, n_frames, num=num_frames, endpoint=False).astype(int)
    return np.arange(n_frames)


def preprocess_frame_cnn(frame_bgr: np.ndarray, img_size: int) -> np.ndarray:
    """BGR uint8 -> (3, S, S) float32, ImageNet-normalized.

    Replicates the reference chain (extract_video_feats.py:32-54 then
    load_frame:23-30): shorter-side resize, center crop, RGB, /255, normalize.
    """
    assert cv2 is not None
    img = frame_bgr
    if img.ndim == 2:
        img = np.tile(img[:, :, None], 3)
    h, w = img.shape[:2]
    if h < w:
        new_w = int(w * img_size / h)
        img = cv2.resize(img, (new_w, img_size))
        off = (new_w - img_size) // 2
        img = img[:, off:off + img_size]
    else:
        new_h = int(h * img_size / w)
        img = cv2.resize(img, (img_size, new_h))
        off = (new_h - img_size) // 2
        img = img[off:off + img_size, :]
    img = cv2.resize(img, (img_size, img_size))
    rgb = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_BGR2RGB)
    x = rgb.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(x, (2, 0, 1))


def letterbox_image(img: np.ndarray, inp_dim) -> np.ndarray:
    """Resize keeping aspect ratio, pad with 128 gray (extract_bbox_feats.py:23-35)."""
    assert cv2 is not None
    img_h, img_w = img.shape[0], img.shape[1]
    w, h = inp_dim
    scale = min(w / img_w, h / img_h)
    new_w, new_h = int(img_w * scale), int(img_h * scale)
    resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    canvas = np.full((h, w, 3), 128)
    canvas[(h - new_h) // 2:(h - new_h) // 2 + new_h,
           (w - new_w) // 2:(w - new_w) // 2 + new_w, :] = resized
    return canvas


def prep_image_yolo(frame_bgr: np.ndarray, img_size: int):
    """BGR uint8 -> ((3, S, S) float32 in [0,1] RGB, letterboxed uint8-ish BGR
    canvas) (extract_bbox_feats.py:37-48, eval_attention.py:49-57)."""
    canvas = letterbox_image(frame_bgr, (img_size, img_size))
    x = canvas[:, :, ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0
    return x, canvas
