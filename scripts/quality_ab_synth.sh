#!/usr/bin/env bash
# Reproducible harness for the SERVING.md quantized-serving quality grid.
#
# Builds a 32-video synthetic corpus, trains a small transformer to
# memorization on CPU, then runs scripts/eval_kv_quant.py over the full
# cache x weight mode grid (bf16/int8/int4 KV x bf16/int8 weights) on the
# TRAIN split. CPU-only (quality is backend-independent at f32 compute);
# ~10-20 min on one core. The round-5 published table (SERVING.md) came
# from this flow.
#
#   bash scripts/quality_ab_synth.sh [workdir]   # default /tmp/vcr_quality
set -eu
cd "$(dirname "$0")/.."
WD="${1:-/tmp/vcr_quality}"
mkdir -p "$WD"
export VCR_QUALITY_WD="$WD"

python - <<'EOF'
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"
wd = os.environ["VCR_QUALITY_WD"]

sys.path.insert(0, "tests")
from util_corpus import build_corpus

build_corpus(wd + "/data", num_videos=32, num_frames=4, feat_dim=24,
             glove_dim=16, captions_per_video=1)
print("corpus ok", flush=True)

common = ["--data_dir", wd + "/data", "--corpus", "msvd_vgg",
          "--glove_emb_file", "glove_tiny.txt", "--num_frames", "4",
          "--vid_feat_size", "24", "--max_len", "8", "--hidden_size", "16",
          "--tf_layers", "2", "--tf_heads", "2", "--bsize", "8",
          "--save_path", wd + "/models", "--log_dir", "", "--seed", "7",
          "--compute_dtype", "float32", "--arch", "transformer"]

from vcr_tpu.cli import main as cli_main

cli_main(["--mode", "train", "--epochs", "60", "--lr", "3e-3"] + common)

sys.path.insert(0, "scripts")
import eval_kv_quant

sys.exit(eval_kv_quant.main(["--split", "train"] + common))
EOF
