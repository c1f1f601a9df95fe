"""Build a tiny synthetic corpus on disk for integration tests: captions JSON,
per-video .npy features, and a truncated GloVe file — the exact artifact layout
the reference's offline prep produces (SURVEY.md §1.5)."""

import json
import os

import numpy as np

SENTS = [
    "a man is playing guitar",
    "a dog runs on the table",
    "the woman is cooking food",
    "a cat jumps on the table",
    "a man is cooking",
    "the dog jumps",
]
WORDS = sorted({w for s in SENTS for w in s.split()})


def build_corpus(root: str, corpus: str = "msvd_vgg", num_videos: int = 6,
                 num_frames: int = 4, feat_dim: int = 12, glove_dim: int = 16,
                 feat_type: str = "cnn", grid: int = 4, seed: int = 0,
                 captions_per_video: int = 2) -> str:
    # captions_per_video=1 makes per-sample caption choice (reference
    # dataset.py:80 random.choice) deterministic — required by the whole-run
    # equivalence harness (scripts/run_equivalence.py).
    rng = np.random.default_rng(seed)
    cdir = os.path.join(root, corpus)
    os.makedirs(os.path.join(cdir, "glove"), exist_ok=True)
    feat_dir = "feats" if feat_type == "cnn" else "bbox_feats"
    os.makedirs(os.path.join(cdir, feat_dir), exist_ok=True)

    glove_file = os.path.join(cdir, "glove", "glove_tiny.txt")
    with open(glove_file, "w") as f:
        for w in WORDS:
            vec = rng.standard_normal(glove_dim)
            f.write(w + " " + " ".join(f"{v:.6f}" for v in vec) + "\n")

    key_field = "video_id" if corpus == "msrvtt" else "video_key"
    for split, n in (("train", num_videos), ("val", max(2, num_videos // 2))):
        samples = []
        for i in range(n):
            vid = f"{split}_vid{i}"
            caps = [{"desc": SENTS[(i + j) % len(SENTS)]}
                    for j in range(captions_per_video)]
            samples.append({key_field: vid, "captions": caps})
            if feat_type == "cnn":
                feats = rng.standard_normal((num_frames, feat_dim)).astype(np.float32)
            else:
                feats = rng.standard_normal(
                    (num_frames, feat_dim, grid, grid)).astype(np.float32)
            np.save(os.path.join(cdir, feat_dir, vid + ".npy"), feats)
        with open(os.path.join(cdir, f"{split}_captions.json"), "w") as f:
            json.dump(samples, f)
    return glove_file
