"""Operational tools: reference-checkpoint parity verification.

``verify_parity`` loads a reference PyTorch checkpoint (model_latest.net /
model_best.net — torch.save dicts, reference train.py:183-205), converts it,
greedy-decodes a feature directory with the converted weights, and writes the
captions (plus tokens) for side-by-side comparison with the reference's
output — the BASELINE.md decode-parity check as a command.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from vcr_tpu.config import Config
from vcr_tpu.convert import load_reference_checkpoint
from vcr_tpu.models import base as model_base
from vcr_tpu.models import build_model
from vcr_tpu.vocab import Vocab


def greedy_captions(params, spec, vocab: Vocab, feats: np.ndarray,
                    batch_size: int = 32) -> List[Dict]:
    """feats (N_vids, num_frames, V) -> list of {tokens, caption}.

    One jitted program for every chunk (the final short chunk zero-pads to
    batch_size: rows are independent in eval — BN uses running stats — so
    padding cannot change real rows, and a second compile is avoided). An
    eager per-op dispatch here costs ~24ms per primitive through the device
    tunnel (CLAUDE.md) — minutes for a corpus."""
    import jax

    fn = jax.jit(lambda p, v: _greedy(p, spec, v))
    out = []
    for start in range(0, len(feats), batch_size):
        chunk = feats[start:start + batch_size]
        n = len(chunk)
        if n < batch_size:
            chunk = np.concatenate(
                [chunk, np.zeros((batch_size - n, *chunk.shape[1:]),
                                 chunk.dtype)])
        tokens = np.asarray(fn(params, jnp.asarray(chunk)))[:n]
        for row in tokens:
            out.append({"tokens": row.tolist(),
                        "caption": vocab.get_sent_from_index(row)})
    return out


def load_inference_state(cfg: Config, checkpoint_path: str = ""):
    """Checkpoint -> ``(cfg, params, spec, vocab)`` ready for inference.

    Model hyperparameters come from the checkpoint's embedded config so the
    rebuilt spec always matches the stored weights (the CLI keeps I/O knobs);
    wrapped-family checkpoints (train_rationale / train_spatial modes)
    dispatch the registry model that owns the param tree while cfg.arch stays
    the BASE captioner (reference --arch semantics). Shared by decode_corpus
    and the serving-artifact exporter."""
    from vcr_tpu.config import adopt_checkpoint_config
    from vcr_tpu.train import checkpoint as ckpt

    path = checkpoint_path or ckpt.best_path(cfg.save_path)
    params, _, meta = ckpt.load_checkpoint(path)
    cfg = adopt_checkpoint_config(cfg, meta)
    vocab = Vocab(os.path.join(cfg.data_dir, cfg.corpus, "glove",
                               cfg.glove_emb_file), seed=cfg.seed)
    spec = model_base.spec_from_config(cfg, vocab)
    if cfg.mode == "train_rationale":
        spec = spec.with_(arch="rationale")
    elif cfg.mode == "train_spatial":
        spec = spec.with_(arch="spatial")
    return cfg, params, spec, vocab


def _build_serving_pool(cfg: Config, checkpoint_path: str = ""):
    """(cfg, path) -> (continuous pool, vocab, arch). ``checkpoint_path``
    may be a frozen continuous artifact (--mode export_continuous output —
    served directly, no model code, no checkpoint) or a checkpoint
    save_path/dir (load_inference_state). Shared by the single- and
    multi-model serve daemons."""
    import jax

    from vcr_tpu.serving_continuous import ContinuousCaptioner

    meta_path = os.path.join(checkpoint_path or "", "meta.json")
    if checkpoint_path and os.path.isfile(meta_path) and \
            json.load(open(meta_path)).get("kind") == "continuous":
        from vcr_tpu.export_continuous import load_continuous

        cc = load_continuous(checkpoint_path)
        return cc, cc.vocab, cc.meta["spec"]["arch"]
    if checkpoint_path and os.path.isdir(
            os.path.join(checkpoint_path, "model_best")):
        # a save_path directory (holds model_best/model_latest), as passed
        # in --serve_models entries: resolve through the normal best-path
        cfg = cfg.replace(save_path=checkpoint_path)
        checkpoint_path = ""
    cfg, params, spec, vocab = load_inference_state(cfg, checkpoint_path)
    mesh = None
    if cfg.mesh_dp > 1:
        from vcr_tpu.parallel import make_mesh

        mesh = make_mesh(cfg.mesh_dp, 1)
    beam = max(cfg.beam_size, 1)
    cc = ContinuousCaptioner(params, spec, slots=cfg.serve_slots,
                             admit_chunk=cfg.serve_admit_chunk,
                             vocab=vocab, mesh=mesh, beam_size=beam,
                             sample_temperature=cfg.sample_temperature,
                             sample_top_k=cfg.sample_top_k,
                             sample_top_p=cfg.sample_top_p,
                             # per-request sampling is OPT-IN (it swaps
                             # argmax for a sort-heavy sampling step on
                             # every token); with beam it raises loudly
                             request_sampling=cfg.serve_request_sampling,
                             kv_cache=cfg.serve_kv_cache,
                             decode_weights=cfg.serve_decode_weights,
                             rng=jax.random.PRNGKey(cfg.seed))
    return cc, vocab, spec.arch


def serve_captions(cfg: Config, checkpoint_path: str = "",
                   block: bool = True):
    """``--mode serve``: load a checkpoint and run the HTTP caption daemon
    (vcr_tpu/server.py) over a continuous-batching slot pool
    (serving_continuous.py). ``--serve_port/--serve_slots/--serve_admit_chunk``
    size it; ``--mesh_dp N`` shards the slot pool over a dp mesh;
    ``--serve_models name1=path1,name2=path2`` serves SEVERAL models from
    one port (vcr_tpu/multiserver.py: POST /caption/<name>, GET /models).
    Serves until SIGINT. Returns the started server when ``block=False``
    (tests)."""
    from vcr_tpu.server import CaptionServer

    max_pending = (None if cfg.serve_max_pending < 0
                   else cfg.serve_max_pending)
    if cfg.serve_models:
        from vcr_tpu.multiserver import MultiCaptionServer

        backends = {}
        for entry in cfg.serve_models.split(","):
            name, _, path = entry.partition("=")
            name, path = name.strip(), path.strip()
            if not name or not path:
                raise ValueError(
                    f"--serve_models entry {entry!r} is not name=path")
            if name in backends:
                # a silent overwrite would route one name's traffic to the
                # other checkpoint and strand the first pool's HBM
                raise ValueError(f"duplicate model name {name!r} in "
                                 f"--serve_models")
            cc, vocab, arch = _build_serving_pool(cfg, path)
            backends[name] = (cc, vocab)
        server = MultiCaptionServer(
            backends, port=cfg.serve_port,
            request_timeout_s=cfg.serve_timeout_s, max_pending=max_pending,
            profile_dir=cfg.serve_profile_dir or None,
            auth_token=cfg.serve_auth_token or None,
            max_body_mb=cfg.serve_max_body_mb).start()
        print(f"serving {len(backends)} models "
              f"({', '.join(sorted(backends))}) on "
              f"http://127.0.0.1:{server.port} — POST /caption/<model>, "
              "GET /models, GET /healthz; Ctrl-C to stop", flush=True)
    else:
        cc, vocab, arch = _build_serving_pool(cfg, checkpoint_path)
        server = CaptionServer(
            cc, vocab=vocab, port=cfg.serve_port,
            request_timeout_s=cfg.serve_timeout_s,
            max_pending=max_pending,
            profile_dir=cfg.serve_profile_dir or None,
            auth_token=cfg.serve_auth_token or None,
            max_body_mb=cfg.serve_max_body_mb).start()
        print(f"serving {arch} captions on http://127.0.0.1:{server.port} "
              f"(R={cc.slots}, A={cc.admit_chunk}) — POST /caption, "
              "GET /healthz; Ctrl-C to stop", flush=True)
    if not block:
        return server
    import signal
    import threading
    import time

    # SIGTERM (systemd/k8s stop) drains like Ctrl-C: close() stops accepting,
    # lets the scheduler finish in-flight decodes, and releases waiting
    # clients — same graceful-preemption stance as the train loop's handler
    stop = threading.Event()
    prev = signal.signal(signal.SIGTERM, lambda *_: stop.set())
    try:
        while not stop.is_set():
            time.sleep(1.0)
        print("SIGTERM: shutting down")
    except KeyboardInterrupt:
        print("shutting down")
    finally:
        signal.signal(signal.SIGTERM, prev)
        server.close()


def export_continuous_artifact(cfg: Config, checkpoint_path: str = "",
                               out_dir: Optional[str] = None) -> str:
    """``--mode export_continuous``: freeze a continuous-batching slot pool
    (encode/admit/step StableHLO graphs + weights + empty pool) under
    ``<save_path>/continuous_artifact``. Pool geometry from
    --serve_slots/--serve_admit_chunk; cpu+tpu lowering like
    export_serving_artifact. Serve it with ``--mode serve
    --pretrained_base <dir>`` (no model code runs on that host)."""
    from vcr_tpu.export_continuous import export_continuous

    # fail fast: sample_temperature is a CLI-override field, so the incoming
    # value IS the post-adoption one — no need to load the checkpoint first
    if cfg.sample_temperature > 0:
        raise NotImplementedError(
            "per-slot sampling is live-pool only (--mode serve); the frozen "
            "continuous artifact bakes greedy/beam argmax into its step "
            "graph — export without --sample_temperature")
    cfg, params, spec, vocab = load_inference_state(cfg, checkpoint_path)
    out = out_dir or os.path.join(cfg.save_path, "continuous_artifact")
    return export_continuous(params, spec, out, slots=cfg.serve_slots,
                             admit_chunk=cfg.serve_admit_chunk,
                             beam_size=max(cfg.beam_size, 1),
                             vocab=vocab, seed=cfg.seed,
                             kv_cache=cfg.serve_kv_cache,
                             decode_weights=cfg.serve_decode_weights,
                             platforms=("cpu", "tpu"))


def export_serving_artifact(cfg: Config, checkpoint_path: str = "",
                            out_dir: Optional[str] = None) -> str:
    """``--mode export_serving``: package a trained checkpoint as a deployable
    StableHLO serving artifact (vcr_tpu/export_serving.py) under
    ``<save_path>/serving_artifact``. Lowered for cpu+tpu so the directory
    serves on a TPU host and replays in CPU CI; decode style follows the
    checkpoint-adopted CLI flags (--beam_size / --sample_temperature /
    --sample_top_k / --sample_top_p); --mesh_dp N > 1 exports a multi-chip artifact (batch
    sharded dp-way, weights replicated)."""
    import jax

    from vcr_tpu import export_serving

    cfg, params, spec, vocab = load_inference_state(cfg, checkpoint_path)
    out = out_dir or os.path.join(cfg.save_path, "serving_artifact")
    rng = jax.random.PRNGKey(cfg.seed)
    return export_serving.export_captioner(
        params, spec, out, featurizer="none", beam_size=cfg.beam_size,
        vocab=vocab, rng=rng, sample_temperature=cfg.sample_temperature,
        sample_top_k=cfg.sample_top_k, sample_top_p=cfg.sample_top_p,
        platforms=("cpu", "tpu"),
        dp=max(cfg.mesh_dp, 1),
        kv_cache=cfg.serve_kv_cache,
        decode_weights=cfg.serve_decode_weights)


def decode_corpus(cfg: Config, checkpoint_path: str = "",
                  out_file: Optional[str] = None, split: str = "val",
                  beam_size: int = 1) -> List[Dict]:
    """Caption every video of a split with a vcr_tpu checkpoint (greedy or
    beam). The plain inference command the reference never had — its only
    decode surfaces were the train-loop eval and eval_attention."""
    import jax

    from vcr_tpu.data.pipeline import CaptionDataset

    cfg, params, spec, vocab = load_inference_state(cfg, checkpoint_path)

    feat_type = "yolo" if cfg.mode == "train_spatial" else "cnn"
    ds = CaptionDataset(cfg.data_dir, cfg.corpus, split, vocab,
                        cfg.num_frames, cfg.max_len, feat_type)
    feats = np.stack([ds.load_features(i) for i in range(len(ds))])
    keys = [ds.captions[i][ds.key_field] for i in range(len(ds))]
    n_real = feats.shape[0]

    # Fixed-size chunks of --bsize (rounded up to a dp multiple): ONE compiled
    # program reused across the whole corpus, bounding HBM (and per-request
    # upload size) no matter how large the split is — decoding all of
    # MSR-VTT's val in a single jit call was the alternative. The final short
    # chunk zero-pads; rows are independent in eval, so padding cannot change
    # real rows (same argument as greedy_captions above).
    mesh = None
    if cfg.mesh_dp * cfg.mesh_mp > 1:
        from vcr_tpu.parallel import make_mesh, shard_batch, shard_params

        mesh = make_mesh(cfg.mesh_dp, cfg.mesh_mp)
        params = shard_params(params, mesh, spec.padded_vocab_size)
        place = lambda a: shard_batch({"vid_feats": a}, mesh)["vid_feats"]  # noqa: E731
    else:
        params = jax.device_put(params)
        place = jnp.asarray

    dp = max(cfg.mesh_dp, 1)
    chunk = min(max(1, cfg.bsize), max(n_real, 1))
    chunk += (-chunk) % dp  # dp-divisible (shard_batch's leading-axis rule)

    if cfg.sample_temperature > 0:
        from vcr_tpu.decode import sample_tokens

        key = jax.random.PRNGKey(cfg.seed)
        fn = jax.jit(lambda p, v, k: sample_tokens(
            p, spec, v, vocab.eos_id, k, cfg.sample_temperature,
            cfg.sample_top_k, cfg.sample_top_p))
        run = lambda v, i: fn(params, v, jax.random.fold_in(key, i))  # noqa: E731
    elif beam_size > 1:
        from vcr_tpu.decode import decode_tokens

        fn = jax.jit(lambda p, v: decode_tokens(p, spec, v, vocab.eos_id,
                                                beam_size))
        run = lambda v, i: fn(params, v)[0][:, 0]  # noqa: E731
    else:
        fn = jax.jit(lambda p, v: _greedy(p, spec, v))
        run = lambda v, i: fn(params, v)  # noqa: E731

    tokens_parts = []
    for ci, start in enumerate(range(0, n_real, chunk)):
        part = feats[start:start + chunk]
        n = len(part)
        if n < chunk:
            part = np.concatenate(
                [part, np.zeros((chunk - n, *part.shape[1:]), part.dtype)])
        tokens_parts.append(np.asarray(run(place(part), ci))[:n])
    tokens = np.concatenate(tokens_parts) if tokens_parts else \
        np.zeros((0, spec.max_len), np.int32)
    results = [{"vid_key": k, "tokens": t.tolist(),
                "caption": vocab.get_sent_from_index(t)}
               for k, t in zip(keys, tokens)]
    if out_file:
        os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
        with open(out_file, "w") as f:
            json.dump(results, f, indent=2)
    return results


def _greedy(params, spec, vid_feats):
    _, apply_fn = build_model(spec.arch)
    out = apply_fn(params, spec, vid_feats, train=False)
    logits = out[0] if isinstance(out, tuple) else out
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def verify_parity(cfg: Config, checkpoint_path: str,
                  out_file: Optional[str] = None) -> List[Dict]:
    """Decode every video of the corpus val split with a converted reference
    checkpoint; write {vid_key, tokens, caption} JSON for comparison."""
    vocab = Vocab(os.path.join(cfg.data_dir, cfg.corpus, "glove",
                               cfg.glove_emb_file), seed=cfg.seed)
    spec = model_base.spec_from_config(cfg, vocab)
    params, meta = load_reference_checkpoint(checkpoint_path, spec, cfg.arch)
    # wrapped families are auto-detected from the state-dict keys; the decode
    # spec must dispatch to the detected registry model, not the base arch
    # (cfg.arch stays the BASE captioner for rationale/spatial, matching the
    # reference's --arch semantics)
    detected = meta.get("detected_arch", cfg.arch)
    if detected in ("rationale", "spatial"):
        spec = spec.with_(arch=detected)
    # the wrapped captioner family is also key-detected (convert.py) — adopt
    # it so a wrong/default --arch still decodes with the right base model
    base = meta.get("detected_base_arch")
    if base is not None and base != spec.base_arch:
        spec = spec.with_(base_arch=base)

    from vcr_tpu.data.pipeline import CaptionDataset

    feat_type = "yolo" if detected == "spatial" else "cnn"
    ds = CaptionDataset(cfg.data_dir, cfg.corpus, "val", vocab,
                        cfg.num_frames, cfg.max_len, feat_type)
    feats = np.stack([ds.load_features(i) for i in range(len(ds))])
    keys = [ds.captions[i][ds.key_field] for i in range(len(ds))]

    captions = greedy_captions(params, spec, vocab, feats, cfg.bsize)
    results = [{"vid_key": k, **c} for k, c in zip(keys, captions)]
    if out_file:
        os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
        with open(out_file, "w") as f:
            json.dump(results, f, indent=2)
    return results


def export_reference_checkpoint(cfg: Config, checkpoint_path: str = "",
                                out_file: Optional[str] = None) -> str:
    """Convert a vcr_tpu checkpoint into a reference-format ``.net`` file
    (torch.save blob {'state_dict', 'opts', 'epoch', 'n_iter',
    'val_meteor_score', 'best_val_meteor_score'} — reference train.py:195-205)
    so models trained here load straight into the PyTorch reference. The
    optimizer state is omitted (the reference saves but never restores it,
    train.py:126-134)."""
    import argparse

    import torch

    from vcr_tpu.config import adopt_checkpoint_config
    from vcr_tpu.convert import export_state_dict
    from vcr_tpu.models.base import spec_from_config
    from vcr_tpu.train import checkpoint as ckpt

    path = checkpoint_path or ckpt.best_path(cfg.save_path)
    params, _, meta = ckpt.load_checkpoint(path)
    cfg = adopt_checkpoint_config(cfg, meta)
    vocab = Vocab(os.path.join(cfg.data_dir, cfg.corpus, "glove",
                               cfg.glove_emb_file), seed=cfg.seed)
    spec = spec_from_config(cfg, vocab)
    arch = ("rationale" if cfg.mode == "train_rationale"
            else "spatial" if cfg.mode == "train_spatial" else cfg.arch)
    sd = export_state_dict(params, spec, arch)
    # torch BN counters increment once per train forward == once per
    # optimizer step; the checkpoint's n_iter is exactly that count (the
    # counter itself is only consulted under momentum=None, never used by
    # the reference — this just makes exports byte-faithful)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(meta.get("n_iter", 0), dtype=np.int64)
    out = out_file or os.path.join(cfg.save_path, "model_export.net")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    blob = {
        "epoch": meta.get("epoch", 0),
        "state_dict": {k: torch.tensor(v) for k, v in sd.items()},
        "n_iter": meta.get("n_iter", 0),
        # reference code reads checkpoint['opts'] as an argparse.Namespace
        "opts": argparse.Namespace(**meta.get("config", {})),
        "val_meteor_score": meta.get("val_meteor_score", 0.0),
        "best_val_meteor_score": meta.get("best_val_meteor_score", 0.0),
    }
    torch.save(blob, out)
    return out
