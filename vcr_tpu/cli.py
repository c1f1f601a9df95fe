"""CLI dispatcher — the reference's driver.py, plus the attention exporter
(which upstream kept as a separate script, eval_attention.py:119-126) unified
under one --mode.

Modes (driver.py:22-47): extract_captions, extract_video_feats,
extract_bbox_feats, extract_glove, train, train_rationale, train_spatial —
plus eval_attention and bench.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np

from vcr_tpu.config import Config, get_config


def set_random_seeds(seed: int) -> None:
    """Seed the host-side RNGs (reference utils.py:8-15; device-side
    randomness uses explicit jax.random keys derived from the same seed)."""
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None) -> None:
    cfg = get_config(argv)
    set_random_seeds(cfg.seed)
    from vcr_tpu.utils.compile_cache import (enable_compile_cache,
                                             maybe_enable_compile_cache)

    if cfg.compile_cache_dir:
        enable_compile_cache(cfg.compile_cache_dir)
    else:
        maybe_enable_compile_cache()
    if cfg.meteor_synonyms or cfg.meteor_paraphrases:
        from vcr_tpu.evals.metrics import configure_meteor_resources
        summary = configure_meteor_resources(cfg.meteor_synonyms,
                                             cfg.meteor_paraphrases)
        if summary:
            print(summary)
    dispatch(cfg)


def dispatch(cfg: Config) -> None:
    if cfg.mode == "extract_captions":
        from vcr_tpu.data.prep.captions import extract_captions

        extract_captions(cfg)
    elif cfg.mode == "extract_video_feats":
        if cfg.corpus == "msvd_vgg":
            from vcr_tpu.data.prep.video_feats import extract_video_feats_msvd_vgg

            extract_video_feats_msvd_vgg(cfg)
        else:
            from vcr_tpu.data.prep.video_feats import extract_video_feats

            extract_video_feats(cfg)
    elif cfg.mode == "extract_bbox_feats":
        from vcr_tpu.data.prep.bbox_feats import extract_bbox_feats

        extract_bbox_feats(cfg)
    elif cfg.mode == "extract_glove":
        from vcr_tpu.data.prep.glove import extract_glove

        extract_glove(cfg)
    elif cfg.mode in ("train", "train_rationale", "train_spatial"):
        from vcr_tpu.train.loop import train

        train(cfg)
    elif cfg.mode == "eval":
        from vcr_tpu.train.loop import evaluate_checkpoint

        evaluate_checkpoint(cfg, cfg.pretrained_base or "")
    elif cfg.mode == "decode":
        from vcr_tpu.tools import decode_corpus

        out = os.path.join(cfg.save_path, "captions.json")
        decode_corpus(cfg, cfg.pretrained_base or "", out,
                      beam_size=cfg.beam_size)
        print(f"captions written to {out}")
    elif cfg.mode == "eval_attention":
        from vcr_tpu.evals.attention_export import run_export

        run_export(cfg)
    elif cfg.mode == "export_serving":
        from vcr_tpu.tools import export_serving_artifact

        out = export_serving_artifact(cfg, cfg.pretrained_base or "")
        print(f"serving artifact written to {out}")
    elif cfg.mode == "serve":
        from vcr_tpu.tools import serve_captions

        serve_captions(cfg, cfg.pretrained_base or "")
    elif cfg.mode == "export_continuous":
        from vcr_tpu.tools import export_continuous_artifact

        out = export_continuous_artifact(cfg, cfg.pretrained_base or "")
        print(f"continuous-serving artifact written to {out}")
    elif cfg.mode == "export_reference":
        from vcr_tpu.tools import export_reference_checkpoint

        out = export_reference_checkpoint(cfg, cfg.pretrained_base or "")
        print(f"reference-format checkpoint written to {out}")
    elif cfg.mode == "bench":
        # bench.py lives at the repo root (driver contract), not in the
        # package — resolve it relative to this file so the mode works from
        # any cwd
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        try:
            import bench
        except ImportError as e:
            raise NotImplementedError(
                "--mode bench needs the repo checkout (bench.py at the repo "
                "root); it is not shipped in the installed package") from e
        bench.main()
    elif cfg.mode == "verify_parity":
        from vcr_tpu.tools import verify_parity

        # pretrained_base carries the reference .net path for this mode
        if not cfg.pretrained_base:
            raise SystemExit(
                "--mode verify_parity needs --pretrained_base "
                "<reference model_*.net> (the checkpoint to convert)")
        out = os.path.join(cfg.save_path, "parity.json")
        verify_parity(cfg, cfg.pretrained_base, out)
        print(f"parity decode written to {out}")
    else:
        raise NotImplementedError("unrecognized mode")


if __name__ == "__main__":
    main(sys.argv[1:])
