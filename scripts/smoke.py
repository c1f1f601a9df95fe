"""One-command end-to-end smoke: build a synthetic corpus, then drive the
whole CLI surface on CPU — train, resume, eval (beam), decode (greedy + beam
+ sampled + mesh-sharded), rationale + spatial workloads, and the
reference-format checkpoint export/import round trip.

Run:  python scripts/smoke.py  (or `make smoke`)

This is the repo's "does everything still work together" command; the test
suite covers the same ground with assertions, this gives a fast human-visible
pass over every mode.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402

# CLAUDE.md: CPU runs must set BOTH (the session env pins JAX_PLATFORMS=axon
# and a sitecustomize force-registers the backend)
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    from util_corpus import build_corpus

    from vcr_tpu.cli import main as cli

    root = tempfile.mkdtemp(prefix="vcr_smoke_")
    data = os.path.join(root, "data")
    data_bbox = os.path.join(root, "data_bbox")
    build_corpus(data)
    build_corpus(data_bbox, feat_type="bbox")
    print(f"[smoke] corpus at {root}")

    common = ["--data_dir", data, "--corpus", "msvd_vgg",
              "--glove_emb_file", "glove_tiny.txt", "--num_frames", "4",
              "--vid_feat_size", "12", "--max_len", "6", "--hidden_size", "8",
              "--bsize", "4", "--log_dir", "", "--seed", "123",
              "--compute_dtype", "float32"]
    models = os.path.join(root, "models")

    steps = [
        ("train s2vt", ["--mode", "train", "--arch", "s2vt", "--epochs", "2",
                        "--lr", "1e-2", "--save_path", models] + common),
        ("resume", ["--mode", "train", "--resume", "true",
                    "--save_path", models] + common),
        ("eval (beam 3)", ["--mode", "eval", "--beam_size", "3",
                           "--save_path", models] + common),
        ("decode greedy", ["--mode", "decode", "--save_path", models] + common),
        ("decode beam", ["--mode", "decode", "--beam_size", "3",
                         "--save_path", models] + common),
        ("decode sampled", ["--mode", "decode", "--sample_temperature", "1.2",
                            "--sample_top_k", "4", "--save_path", models]
         + common),
        ("export_reference", ["--mode", "export_reference",
                              "--save_path", models] + common),
        ("export_serving", ["--mode", "export_serving",
                            "--save_path", models] + common),
        ("export_continuous", ["--mode", "export_continuous",
                               "--serve_slots", "2", "--serve_admit_chunk",
                               "1", "--save_path", models] + common),
        ("train_rationale", ["--mode", "train_rationale", "--arch", "s2vt",
                             "--tau", "1.0", "--epochs", "1", "--lr", "1e-2",
                             "--save_path", os.path.join(root, "models_rat")]
         + common),
        ("train_spatial", ["--mode", "train_spatial", "--arch", "s2vt",
                           "--epochs", "1", "--lr", "1e-2",
                           "--save_path", os.path.join(root, "models_sp"),
                           "--data_dir", data_bbox] + common[2:]),
    ]
    for name, args in steps:
        print(f"\n[smoke] ==== {name} ====")
        cli(args)

    # serve blocks, so drive it through the non-blocking API: the single
    # daemon on the checkpoint, then the multi daemon mixing the live
    # checkpoint with the frozen artifact exported above
    print("\n[smoke] ==== serve (single + multi) ====")
    import io
    import json
    import urllib.request

    import numpy as np

    from vcr_tpu.config import get_config
    from vcr_tpu.tools import serve_captions

    art = os.path.join(models, "continuous_artifact")
    feats = np.random.default_rng(0).standard_normal((4, 12)).astype(
        np.float32)
    buf = io.BytesIO()
    np.save(buf, feats)
    body = buf.getvalue()

    def post(port, path):
        req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                     data=body)
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    srv = serve_captions(get_config(
        ["--mode", "serve", "--serve_port", "0", "--serve_slots", "2",
         "--serve_admit_chunk", "1", "--save_path", models] + common),
        block=False)
    try:
        out = post(srv.port, "/caption")
        assert out["tokens"], out
        print(f"[smoke] single serve: {out}")
    finally:
        srv.close()

    srv = serve_captions(get_config(
        ["--mode", "serve", "--serve_port", "0", "--serve_slots", "2",
         "--serve_admit_chunk", "1", "--save_path", models,
         "--serve_models", f"live={models},frozen={art}"] + common),
        block=False)
    try:
        a = post(srv.port, "/caption/live")
        b = post(srv.port, "/caption/frozen")
        assert a["tokens"] == b["tokens"], (a, b)
        print(f"[smoke] multi serve live==frozen: {a}")
    finally:
        srv.close()

    print("\n[smoke] ALL MODES OK")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
