"""Typed configuration for vcr_tpu.

Replaces the reference's flat argparse namespace (reference: args.py:9-64), the
second ad-hoc parser in eval_attention.py:119-126, and the sed-templated sweep
configs (reference: scripts/schedule_jobs.py) with one serializable dataclass.
The full config is persisted into every checkpoint (mirroring the reference's
``opts`` inside torch.save dicts, reference: train.py:188) so models can be
rebuilt from a checkpoint alone (reference: eval_attention.py:80-86).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass
from typing import Any, Dict, Optional

CORPORA = ("msvd", "msrvtt", "msvd_vgg")
ARCHS = ("s2vt", "s2vt-att", "transformer")


@dataclass
class Config:
    """All knobs. Field names follow the reference flags (args.py) where they exist."""

    # General (reference args.py:14)
    mode: str = "train"

    # Data (reference args.py:17-22)
    data_dir: str = "./data"
    corpus: str = "msvd_vgg"
    nworkers: int = 4
    bsize: int = 32
    shuffle: bool = True
    glove_emb_file: str = "glove.6B.300d.txt"

    # Image model (reference args.py:25-28)
    img_size: int = 224
    vision_arch: str = "resnet34"
    num_frames: int = 30
    vid_feat_size: int = 4096

    # Model (reference args.py:31-37)
    arch: str = "s2vt"
    max_len: int = 20
    dropout_p: float = 0.2
    hidden_size: int = 512
    schedule_sample: bool = False
    tau: float = 1.0
    pretrained_base: Optional[str] = None

    # Transformer shape (hard-coded N=6, heads=8 in reference train.py:100)
    tf_layers: int = 6
    tf_heads: int = 8

    # Optimization (reference args.py:40-48)
    optim: str = "adam"
    lr: float = 2e-3
    wd: float = 4e-5
    momentum: float = 0.9
    epochs: int = 1000
    max_norm: float = 1.0
    start_epoch: int = 0
    lambda_brev: float = 1.0
    lambda_cont: float = 1.0

    # Other (reference args.py:51-56)
    save_path: str = "./trained_models"
    log_dir: str = "./logs"
    log_iter: int = 5
    n_sample_sent: int = 5
    resume: bool = False
    seed: int = 123

    # --- TPU-native knobs (no reference equivalent) ---
    # Mesh axes: data-parallel x model-parallel. 1x1 = single chip.
    mesh_dp: int = 1
    mesh_mp: int = 1
    # Compute dtype for matmuls ("bfloat16" rides the MXU at full rate;
    # "float32" for parity tests). Params are always stored float32.
    compute_dtype: str = "bfloat16"
    # Use the Pallas fused GRU sequence kernel where profitable.
    use_pallas: bool = False
    # Pad the vocab axis to a multiple of this (128 = MXU lane width; must make
    # the padded vocab divisible by mesh_mp). 1 = exact reference widths.
    vocab_pad_to: int = 1
    # Remat (jax.checkpoint) the decoder scan to trade FLOPs for HBM.
    remat: bool = False
    # Gradient accumulation: split each batch into N sequential microbatches
    # and apply ONE optimizer update from the valid-count-weighted mean of
    # their gradients — EXACTLY the full-batch gradient (the masked losses are
    # means over valid rows), at 1/N the activation memory and program size.
    # bsize must be divisible by it. (SpatialNet's BN batch stats follow the
    # last microbatch, matching torch accumulation semantics.)
    grad_accum: int = 1
    # Persistent XLA compilation cache directory ("" = off; also settable via
    # the VCR_COMPILE_CACHE env var for the bench entries). Cold TPU compiles
    # cost 20-40s; the on-disk cache makes every program after the first
    # process free across runs/restarts/preemption-resume cycles.
    compile_cache_dir: str = ""
    # PRNG implementation for the training step's dropout/teacher-force keys.
    # "rbg" rides the TPU's hardware RNG and measures ~7% faster train steps
    # than "threefry2x32" (the mask *distribution* is identical; only the
    # stream differs, and no reference-parity surface depends on the stream).
    rng_impl: str = "rbg"
    # Beam width for decode (1 = greedy, matching the reference's only mode).
    beam_size: int = 1
    # Stochastic decode for --mode decode: temperature > 0 switches from
    # greedy/beam to per-step categorical sampling (optionally top-k and/or
    # top-p nucleus restricted; decode.sample_tokens). 0 = off.
    sample_temperature: float = 0.0
    sample_top_k: int = 0
    sample_top_p: float = 0.0
    # Save a mid-epoch checkpoint every N train iterations (0 = off). Resume
    # restarts from the exact batch (preemption tolerance; the reference only
    # checkpointed per epoch).
    ckpt_iter: int = 0
    # --mode serve: HTTP caption daemon over the continuous-batching slot
    # pool (vcr_tpu/server.py). serve_slots = R device decode slots (the
    # effective serving batch); serve_port 0 = OS-assigned.
    serve_port: int = 8000
    serve_slots: int = 64
    serve_admit_chunk: int = 8
    # serve_max_pending bounds outstanding requests (queued + in-flight):
    # beyond it POST /caption returns 503 + Retry-After. 0 = unbounded,
    # -1 (default) = 4 * serve_slots. serve_timeout_s bounds each client's
    # wait; on timeout the request is cancelled (queued: dropped; decoding:
    # slot released back to the pool).
    serve_max_pending: int = -1
    serve_timeout_s: float = 120.0
    # Accept per-request ?temperature=&top_k=&top_p= on POST /caption.
    # OFF by default: the sampling step path pays two full-vocab sorts +
    # a categorical draw per token where greedy pays one argmax — only the
    # pools that need it should carry that. --sample_temperature > 0 also
    # enables it (the pool is already on the sampling path then).
    serve_request_sampling: bool = False
    # KV-cache storage for the serving pool's transformer decode caches:
    # "bf16" (exact — token-identical to the batch decode paths), "int8"
    # (per-vector symmetric quantization, ~2x less cache HBM traffic per
    # tick; bounded-error, NOT token-identical — ops/kvquant.py) or "int4"
    # (experimental ±7 codebook in native s4 storage, ~4x less cache
    # traffic, ~16x int8's per-element error — A/B quality with
    # scripts/eval_kv_quant.py first). Only meaningful for
    # transformer-family models; others reject quantized modes.
    serve_kv_cache: str = "bf16"
    # Decoder WEIGHT storage for the transformer serving paths: "bf16"
    # (exact) or "int8" (per-output-channel symmetric W8 — halves the
    # per-tick decoder weight byte stream, the largest remaining term once
    # the KV caches are quantized; bounded-error, NOT token-identical —
    # ops/wquant.py). Composes with serve_kv_cache. Transformer-family
    # only; others reject it.
    serve_decode_weights: str = "bf16"
    # Enable POST /profile?seconds=S: capture a jax.profiler trace of live
    # serving under this directory. "" (default) = endpoint disabled (an
    # unauthenticated capture holds a handler thread and costs memory).
    serve_profile_dir: str = ""
    # Multi-model serving: "name1=path1,name2=path2" serves several
    # checkpoints / frozen artifacts from one port (vcr_tpu/multiserver.py:
    # POST /caption/<name>, GET /models; per-model pools share the chip
    # through interleaved scheduler threads). "" = single-model daemon.
    serve_models: str = ""
    # Bearer-token auth for the daemon's POST routes (caption/profile):
    # clients must send "Authorization: Bearer <token>". "" = open (default;
    # healthz/metrics are always open for probes/scrapers). Bodies above
    # serve_max_body_mb MiB get 413 (0 = unbounded).
    serve_auth_token: str = ""
    serve_max_body_mb: float = 256.0
    # METEOR matcher-stage resources (evals/metrics.py). The synonym (w=0.8)
    # and paraphrase (w=0.6) stages of the Meteor 1.5 jar are implemented but
    # inert without data (their files are env-blocked here). synonyms: "" =
    # off, "wordnet" = build from nltk_data where installed, else a
    # `word<TAB>synset ids` TSV path; paraphrases: "" = off, else a
    # `phrase<TAB>phrase` TSV path.
    meteor_synonyms: str = ""
    meteor_paraphrases: str = ""
    # eval_attention export inputs (reference eval_attention.py:119-126)
    spatial_net_file: str = ""
    vid_file: str = ""
    out_dir: str = "./attention_maps"
    export_all: bool = False

    def validate(self) -> "Config":
        if self.corpus not in CORPORA:
            raise NotImplementedError(f"Unknown corpus {self.corpus!r}")  # args.py:61-62
        # catch an --arch typo at parse time, BEFORE the multi-minute GloVe
        # load (rationale/spatial are modes, not archs: --arch stays the base
        # captioner there, reference train_rationale.py/train_spatial.py)
        if self.arch not in ARCHS:
            raise NotImplementedError(f"Unknown model architecture {self.arch!r}")
        return self

    # ---- serialization (checkpoints embed the config) ----
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


# I/O and runtime knobs that stay under CLI control when a checkpoint's
# embedded config is adopted; everything else (arch, widths, dtype, tau, ...)
# must come from the checkpoint or the rebuilt model won't match the stored
# weights (reference resume adopts opts wholesale, train.py:133).
_CLI_OVERRIDE_FIELDS = (
    "data_dir", "corpus", "glove_emb_file", "save_path", "bsize", "nworkers",
    "n_sample_sent", "beam_size", "sample_temperature", "sample_top_k",
    "sample_top_p",
    "seed", "out_dir", "vid_file", "export_all",
    "pretrained_base", "spatial_net_file", "log_dir", "log_iter",
    "mesh_dp", "mesh_mp", "compile_cache_dir",
    "serve_port", "serve_slots", "serve_admit_chunk",
    "serve_max_pending", "serve_timeout_s", "serve_request_sampling",
    "serve_kv_cache", "serve_decode_weights",
    "serve_profile_dir", "serve_models", "serve_auth_token",
    "serve_max_body_mb",
    "meteor_synonyms", "meteor_paraphrases",
)


def adopt_checkpoint_config(cli_cfg: Config, meta: Dict[str, Any]) -> Config:
    """Rebuild the Config for eval/decode-style consumers of a checkpoint:
    model hyperparameters from the checkpoint's embedded config (so the model
    always matches the stored weights), I/O + runtime knobs from the CLI."""
    cfg = Config.from_dict(meta["config"])
    return cfg.replace(**{f: getattr(cli_cfg, f) for f in _CLI_OVERRIDE_FIELDS})


def _str2bool(t: str) -> bool:
    # reference args.py:3-7 semantics: anything not in the truthy set is False
    return t.lower() in ("true", "t", "1")


def build_parser() -> argparse.ArgumentParser:
    """CLI mirroring every reference flag plus the TPU-native extras."""
    p = argparse.ArgumentParser(description="vcr_tpu: TPU-native video caption + rationale")
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        default = f.default
        if f.type in ("bool", bool) or isinstance(default, bool):
            p.add_argument(name, default=default, type=_str2bool)
        elif isinstance(default, int):
            p.add_argument(name, default=default, type=int)
        elif isinstance(default, float):
            p.add_argument(name, default=default, type=float)
        else:
            p.add_argument(name, default=default, type=str)
    return p


def get_config(argv: Optional[list] = None) -> Config:
    ns = build_parser().parse_args(argv)
    cfg = Config(**vars(ns)).validate()
    print(f"Running on {cfg.corpus.upper()} corpus")  # parity with args.py:60
    return cfg
