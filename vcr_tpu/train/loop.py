"""The training loop — one generic implementation of the reference's three
near-identical loops (train.py:79-205, train_rationale.py:93-205,
train_spatial.py:74-192), parameterized by workload.

Loop semantics preserved: per-epoch teacher-force schedule, windowed train
logging, per-epoch validation with METEOR (plus BLEU-4 / CIDEr / ROUGE-L, new —
BASELINE.md requires them), sample-sentence printing, latest/best
checkpointing keyed on val METEOR with >= improvement, resume.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from vcr_tpu.config import Config
from vcr_tpu.data.pipeline import BatchIterator, CaptionDataset, prefetch
from vcr_tpu.evals import metrics as qmetrics
from vcr_tpu.models import base as model_base
from vcr_tpu.train import checkpoint as ckpt
from vcr_tpu.train import optim, schedule
from vcr_tpu.train.step import build_step_fns, device_batch
from vcr_tpu.utils.logging import TrainLogger
from vcr_tpu.utils.profiling import StepTimer, annotate, trace
from vcr_tpu.utils.sampler import StreamSampler, print_sample_sents
from vcr_tpu.vocab import Vocab

WORKLOADS = {
    # mode -> (model_name fn, log keys, feat_type, uses tf schedule)
    "train": (lambda cfg: cfg.arch, ["acc", "loss"], "cnn", True),
    "train_rationale": (lambda cfg: "rationale",
                        ["acc", "loss", "loss_ce", "loss_brev", "loss_cont", "len"],
                        "cnn", False),
    "train_spatial": (lambda cfg: "spatial", ["acc", "loss"], "yolo", True),
}


def make_datasets(cfg: Config, vocab: Vocab, feat_type: str,
                  with_train: bool = True
                  ) -> Tuple[Optional[BatchIterator], BatchIterator]:
    """with_train=False skips loading/tokenizing the train split entirely —
    eval-only consumers (evaluate_checkpoint) pay only for val."""
    val_ds = CaptionDataset(cfg.data_dir, cfg.corpus, "val", vocab,
                            cfg.num_frames, cfg.max_len, feat_type)
    # multi-host: each process iterates a disjoint strided sample shard and
    # contributes cfg.bsize rows per step (global batch = process_count x
    # bsize, assembled by parallel.mesh.shard_batch via
    # make_array_from_process_local_data); shards pad to a common batch count
    # so collectives stay in lockstep (the single-GPU reference had no
    # equivalent; SURVEY §2 parallelism plan)
    nproc, pidx = jax.process_count(), jax.process_index()
    train_it = None
    if with_train:
        train_ds = CaptionDataset(cfg.data_dir, cfg.corpus, "train", vocab,
                                  cfg.num_frames, cfg.max_len, feat_type)
        train_it = BatchIterator(train_ds, cfg.bsize, shuffle=True,
                                 seed=cfg.seed, num_threads=cfg.nworkers,
                                 num_shards=nproc, shard_index=pidx)
    val_it = BatchIterator(val_ds, cfg.bsize, shuffle=False, seed=cfg.seed,
                           num_threads=cfg.nworkers,
                           num_shards=nproc, shard_index=pidx)
    return train_it, val_it


def _staged(it, place=None):
    """Start each batch's host->device transfer from the prefetch thread so
    the upload overlaps the previous step's compute. ``place`` maps the array
    fields onto devices (default single-device put; mesh runs shard here)."""
    place = place or (lambda b: jax.device_put(b))
    for batch in it:
        batch["_device"] = place(device_batch(batch))
        yield batch


def _build_beam_fn(spec, model_name: str, vocab, beam_size: int):
    """Jitted (params, vid_feats, rng) -> (tokens (B, K, L), scores) for
    beam-search validation decode, or None for greedy (beam_size <= 1). One
    home for this wiring — train() and evaluate_checkpoint() must not drift.
    Dispatches on the registry model (rationale/spatial wrap cfg.arch)."""
    if beam_size <= 1:
        return None
    from functools import partial

    from vcr_tpu.decode import decode_tokens

    beam_spec = spec.with_(arch=model_name)
    return jax.jit(partial(
        lambda p, v, r, spec_, k_: decode_tokens(p, spec_, v, vocab.eos_id,
                                                 k_, rng=r),
        spec_=beam_spec, k_=beam_size))


def _gather_global_rows(pred, batch, ds, vocab):
    """Multi-host eval gather: returns (hyps, refs, vid_keys) for every VALID
    row of the global batch, identical on every process.

    Token ids travel through an allgather; references never need to — each
    row's ``sample_idx`` (vcr_tpu/data/pipeline.py batch field) is gathered
    alongside and resolved against the local captions metadata, which every
    host loads from the same file. Collective: all processes call per batch
    (the data pipeline's lockstep padding guarantees equal batch counts)."""
    from vcr_tpu.parallel.mesh import gather_global_rows, local_rows

    # one fused allgather per batch: token ids with the row's dataset index
    # appended as a trailing column (both int32; DCN round-trips are the
    # multi-host eval cost, not bytes)
    local = np.concatenate(
        [local_rows(pred).astype(np.int32),
         np.asarray(batch["sample_idx"], np.int32)[:, None]], axis=1)
    packed = gather_global_rows(local)                   # (nproc*b, L+1)
    toks, idxs = packed[:, :-1], packed[:, -1]
    valid = idxs >= 0
    if not valid.any():
        return [], [], []
    hyps = vocab.get_sents_from_indexes(toks[valid])
    refs, keys = [], []
    for i in idxs[valid]:
        caps = ds.captions[int(i)]
        refs.append([" ".join(c["desc"]).lower() for c in caps["captions"]])
        keys.append(caps[ds.key_field])
    return hyps, refs, keys


def evaluate(eval_step, params, val_it, vocab, log_keys, n_sample_sent, seed=0,
             place=None, beam_fn=None):
    """Validation pass (reference train.py:46-76): per-batch metrics averaged
    over batches, per-sample METEOR, sampled (hyp, ref, vid) triples. Adds
    corpus BLEU-4, CIDEr-D and ROUGE-L over the whole split.

    beam_fn: optional jitted (params, vid_feats, rng) -> (tokens (B,K,L),
    scores); when given, caption metrics score the beam-best hypotheses while
    loss/acc stay on the greedy eval logits. The rng (fresh per batch, folded
    from ``seed``) seeds eval stochasticity — RationaleNet's torch eval draws
    fresh Gumbel noise per forward (RationaleNet.py:50)."""
    t0 = time.time()
    sums: Dict[str, float] = {k: 0.0 for k in log_keys}
    meteor_sum, num_batches = 0.0, 0
    sampler = StreamSampler(n_sample_sent, seed=seed)
    all_hyps, all_refs = [], []
    rnd = np.random.default_rng(seed)
    eval_key = jax.random.PRNGKey(seed)

    n_seen = 0
    for batch in prefetch(_staged(val_it, place)):
        # the step must still run on every batch (multi-host lockstep: padded
        # batches keep the collectives in sync), but all-padding batches must
        # not dilute the metric averages
        batch_key = jax.random.fold_in(eval_key, n_seen)
        m, pred = eval_step(params, batch["_device"], batch_key)
        if beam_fn is not None:
            tokens, _scores = beam_fn(params, batch["_device"]["vid_feats"],
                                      batch_key)
            pred = tokens[:, 0]  # beam-best
        n_seen += 1
        if jax.process_count() > 1:
            # multi-host: pred is a GLOBAL dp-sharded array — this process
            # can only read its own rows. Allgather every process's token ids
            # + dataset indexes, then rebuild the other shards' references
            # locally from the captions file (every host has it). All
            # processes end with the identical global hyp/ref set, so the
            # corpus metrics — and therefore the is_best checkpoint decision
            # — agree across hosts. Skipping this batch must also be a
            # global decision, hence the gather happens before the
            # valid-count check.
            hyps, refs_b, keys_b = _gather_global_rows(pred, batch, val_it.ds,
                                                       vocab)
            if not hyps:
                continue
            m = jax.device_get(m)
        else:
            n_valid = int(batch["valid"].sum())
            if n_valid == 0:
                continue
            m, pred = jax.device_get((m, pred))  # one bulk transfer per batch
            hyps = vocab.get_sents_from_indexes(np.asarray(pred)[:n_valid])
            refs_b, keys_b = batch["refs"], batch["vid_key"]
        for hyp, refs, vk in zip(hyps, refs_b, keys_b):
            sampler.add((hyp, refs[rnd.integers(len(refs))], vk))
        meteor_sum += qmetrics.batch_meteor(hyps, refs_b)
        all_hyps.extend(hyps)
        all_refs.extend(refs_b)
        for k in log_keys:
            sums[k] += float(np.asarray(m[k]))
        num_batches += 1

    avg = {k: v / max(num_batches, 1) for k, v in sums.items()}
    avg["METEOR"] = meteor_sum / max(num_batches, 1)
    avg["BLEU4"] = qmetrics.corpus_bleu(all_hyps, all_refs)
    avg["CIDEr"] = qmetrics.cider_d(all_hyps, all_refs)
    avg["ROUGE_L"] = qmetrics.corpus_rouge_l(all_hyps, all_refs)
    avg.update(qmetrics.corpus_embedding_metrics(
        all_hyps, all_refs, qmetrics.vocab_lookup(vocab)))
    return avg, sampler.get(), time.time() - t0


def evaluate_checkpoint(cfg: Config, ckpt_path: str = "") -> Dict[str, float]:
    """Eval-only: load a vcr_tpu checkpoint (default <save_path>/model_best)
    and run the validation pass (metrics incl. METEOR/BLEU-4/CIDEr/ROUGE-L).

    The model is rebuilt from the checkpoint's EMBEDDED config — the CLI only
    supplies I/O knobs (data_dir, bsize, ...), so `--mode eval --save_path X`
    works without re-specifying every architecture flag."""
    path = ckpt_path or ckpt.best_path(cfg.save_path)
    params, _, meta = ckpt.load_checkpoint(path)
    from vcr_tpu.config import adopt_checkpoint_config
    cfg = adopt_checkpoint_config(cfg, meta)

    mode = cfg.mode if cfg.mode in WORKLOADS else "train"
    model_name_fn, log_keys, feat_type, _ = WORKLOADS[mode]
    model_name = model_name_fn(cfg)

    vocab = Vocab(os.path.join(cfg.data_dir, cfg.corpus, "glove", cfg.glove_emb_file),
                  seed=cfg.seed)
    spec = model_base.spec_from_config(cfg, vocab)
    _, val_it = make_datasets(cfg, vocab, feat_type, with_train=False)

    optimizer = optim.build_optimizer(cfg.optim, cfg.lr, cfg.wd, cfg.max_norm)
    _, eval_step = build_step_fns(model_name, spec, optimizer,
                                  cfg.lambda_brev, cfg.lambda_cont)

    beam_fn = _build_beam_fn(spec, model_name, vocab, cfg.beam_size)

    metrics, samples, time_taken = evaluate(
        eval_step, params, val_it, vocab, log_keys, cfg.n_sample_sent, cfg.seed,
        beam_fn=beam_fn)
    print(f"Eval of {path} (epoch {meta.get('epoch')}): "
          + ", ".join(f"{k}={v:.5f}" for k, v in metrics.items()))
    print_sample_sents(samples)
    return metrics


def train(cfg: Config) -> Dict[str, float]:
    """Entry point for modes train / train_rationale / train_spatial."""
    # Resume adopts the checkpointed config (reference train.py:133) — do it
    # BEFORE building the model, so the restore templates match the saved
    # shapes and `--resume true` needs only I/O flags (same convention as
    # eval/decode, which rebuild from the embedded config).
    if cfg.resume:
        meta_early = ckpt.peek_meta(ckpt.latest_path(cfg.save_path))
        if meta_early is not None and meta_early.get("config"):
            # keep resume=True: the SAVED config may predate this resume
            # request, and try_resume below is gated on it
            cfg = Config.from_dict(meta_early["config"]).replace(resume=True)

    mode = cfg.mode if cfg.mode in WORKLOADS else "train"
    model_name_fn, log_keys, feat_type, use_tf_schedule = WORKLOADS[mode]
    model_name = model_name_fn(cfg)

    vocab = Vocab(os.path.join(cfg.data_dir, cfg.corpus, "glove", cfg.glove_emb_file),
                  seed=cfg.seed)
    spec = model_base.spec_from_config(cfg, vocab)
    train_it, val_it = make_datasets(cfg, vocab, feat_type)

    init_fn, _ = model_base.build_model(model_name)
    # typed key so cfg.rng_impl picks the generator ("rbg" = TPU hardware RNG,
    # ~7% faster steps than threefry; see Config.rng_impl)
    root_key = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    params = init_fn(jax.random.fold_in(root_key, 0), spec, vocab.vectors)

    # RationaleNet warm-start from a pretrained captioner (RationaleNet.py:80-82)
    if model_name == "rationale" and cfg.pretrained_base:
        base_params, _, _ = ckpt.load_checkpoint(cfg.pretrained_base)
        params = dict(params)
        params["caption_net"] = jax.tree_util.tree_map(
            lambda t, s: np.asarray(s, dtype=t.dtype),
            params["caption_net"], base_params)
        print(f"====> Loaded pretrained base from {cfg.pretrained_base}")

    # SPMD: place params on the (dp x mp) mesh when configured; the jitted
    # steps inherit shardings from their inputs (vcr_tpu/parallel/mesh.py)
    mesh = None
    if jax.process_count() > 1 and cfg.mesh_dp * cfg.mesh_mp <= 1:
        # Without a mesh there is NO gradient synchronization: each process
        # would train its own model on its own data shard while the
        # multi-host eval/checkpoint paths blend them — silent corruption.
        raise RuntimeError(
            f"multi-process launch ({jax.process_count()} processes) "
            "requires an SPMD mesh spanning every device: set --mesh_dp "
            f"(x --mesh_mp) to cover all {len(jax.devices())} global devices.")
    if cfg.mesh_dp * cfg.mesh_mp > 1:
        from vcr_tpu.parallel import make_mesh, shard_params

        if jax.process_count() > 1:
            assert cfg.mesh_dp * cfg.mesh_mp == len(jax.devices()), (
                f"multi-process mesh {cfg.mesh_dp}x{cfg.mesh_mp} must span "
                f"all {len(jax.devices())} global devices — a submesh would "
                "leave some processes without devices")
        mesh = make_mesh(cfg.mesh_dp, cfg.mesh_mp)
        # global batch = per-process bsize x process_count (multi-host data
        # parallelism: each host contributes its own rows, mesh.shard_batch)
        global_bsize = cfg.bsize * jax.process_count()
        assert global_bsize % cfg.mesh_dp == 0, \
            f"global bsize {global_bsize} must divide mesh_dp {cfg.mesh_dp}"
        params = shard_params(params, mesh, spec.padded_vocab_size)

    optimizer = optim.build_optimizer(cfg.optim, cfg.lr, cfg.wd, cfg.max_norm,
                                      cfg.momentum)
    opt_state = optimizer.init(params)
    # constant tf schedule (the default): pass tf statically so the decoders
    # can hoist the vocab projection out of the decode scan (step.py static_tf)
    scheduled_tf = use_tf_schedule and cfg.schedule_sample
    train_step, eval_step = build_step_fns(model_name, spec, optimizer,
                                           cfg.lambda_brev, cfg.lambda_cont,
                                           remat=cfg.remat,
                                           grad_accum=cfg.grad_accum,
                                           static_tf=None if scheduled_tf else 1.0)
    if mesh is not None:
        from vcr_tpu.parallel import shard_batch

        place = lambda b: shard_batch(b, mesh)  # noqa: E731
    else:
        place = None

    # beam-search validation decode (cfg.beam_size > 1); greedy otherwise
    beam_fn = _build_beam_fn(spec, model_name, vocab, cfg.beam_size)

    tf_probs = schedule.teacher_force_schedule(
        cfg.epochs, cfg.schedule_sample if use_tf_schedule else False)

    manager = ckpt.CheckpointManager(cfg.save_path)
    start_n_iter, best_val_meteor = 0, 0.0
    start_epoch = cfg.start_epoch
    skip_batches = 0  # mid-epoch resume: batches already done in start_epoch
    if cfg.resume:
        resumed = manager.try_resume(params, opt_state)
        if resumed is not None:
            print("====> Resuming training from previous checkpoint")
            params, opt_state, meta = resumed
            start_n_iter = meta["n_iter"]
            best_val_meteor = meta.get("best_val_meteor_score", 0.0)
            cfg = Config.from_dict(meta["config"])  # train.py:133 adopts saved opts
            if meta.get("batch_in_epoch") is not None:
                start_epoch = meta["epoch"]          # mid-epoch checkpoint
                skip_batches = meta["batch_in_epoch"]
                print(f"====> Mid-epoch resume: epoch {start_epoch}, "
                      f"skipping {skip_batches} batches")
            else:
                start_epoch = meta["epoch"] + 1

    logger = TrainLogger(start_epoch, cfg.log_iter, cfg.log_dir)
    logger.set(log_keys)
    logger.n_iter = start_n_iter

    # Graceful preemption (beyond reference: Condor could only kill + restart
    # from the last EPOCH checkpoint): SIGTERM/SIGINT set a flag; the loop
    # saves a mid-epoch checkpoint at the next step boundary (or exits at the
    # epoch boundary if the signal lands during validation/checkpointing) so
    # `--resume true` continues from the exact batch. A SECOND signal
    # restores the previous handlers and re-raises, so an impatient Ctrl+C
    # (or a scheduler's escalation) still kills the process immediately.
    import signal

    preempted = {"flag": False}
    prev_handlers = {}

    def _restore_handlers():
        while prev_handlers:
            sig, h = prev_handlers.popitem()
            signal.signal(sig, h)

    def _on_preempt(signum, frame):
        if preempted["flag"]:          # second signal: stop cooperating
            _restore_handlers()
            signal.raise_signal(signum)
            return
        preempted["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_preempt)
        except ValueError:  # non-main thread (tests): leave handlers alone
            pass

    def _save_latest(epoch, batch_in_epoch, params, opt_state, best):
        ckpt.save_checkpoint(
            ckpt.latest_path(cfg.save_path), params, opt_state,
            {"epoch": epoch, "n_iter": logger.n_iter,
             "config": cfg.to_dict(),
             "best_val_meteor_score": best,
             "batch_in_epoch": batch_in_epoch})

    final_metrics: Dict[str, float] = {}
    timer = StepTimer()
    try:
        return _train_epochs(
            cfg, start_epoch, tf_probs, train_it, val_it, vocab, log_keys,
            logger, timer, params, opt_state, train_step, eval_step, place,
            beam_fn, manager, best_val_meteor, skip_batches, root_key,
            preempted, _save_latest, final_metrics)
    finally:
        _restore_handlers()


def _global_preempted(preempted) -> bool:
    """Preemption consensus. A SIGTERM lands on each host at its own time;
    save_checkpoint is a COLLECTIVE in multi-process runs, so acting on a
    process-local flag would have one host enter the checkpoint barrier
    while peers enter the next step's gradient all-reduce — a deadlock.
    Every step boundary, all hosts agree via a max-reduce of the local flag
    (one scalar collective; single-process returns the flag directly)."""
    if jax.process_count() == 1:
        return preempted["flag"]
    from jax.experimental import multihost_utils

    agreed = multihost_utils.process_allgather(
        np.asarray(preempted["flag"], np.int32))
    return bool(np.max(agreed))


def _train_epochs(cfg, start_epoch, tf_probs, train_it, val_it, vocab,
                  log_keys, logger, timer, params, opt_state, train_step,
                  eval_step, place, beam_fn, manager, best_val_meteor,
                  skip_batches, root_key, preempted, _save_latest,
                  final_metrics):
    """Epoch loop body of train() (split out so the signal-handler install/
    restore wraps it in one try/finally)."""
    with trace():  # XLA trace when VCR_TRACE_DIR is set (SURVEY.md §5)
        for epoch in range(start_epoch, cfg.epochs):
            logger.step()
            tf_prob = float(tf_probs[epoch])
            sampler = StreamSampler(cfg.n_sample_sent, seed=cfg.seed + epoch)
            rnd = np.random.default_rng(cfg.seed + epoch)

            # deterministic shuffle per absolute epoch (also makes mid-epoch
            # resume land on the exact same batch order)
            train_it.epoch = epoch
            # index-level skip: the iterator drops already-trained batches
            # BEFORE feature IO (no wasted .npy reads on resume)
            train_it.skip_next = skip_batches
            batch_in_epoch = skip_batches
            timer.reset()
            for batch in prefetch(_staged(train_it, place)):
                timer.tick()
                step_key = jax.random.fold_in(root_key, logger.n_iter + 1)
                params, opt_state, m, pred = train_step(
                    params, opt_state, batch["_device"], step_key, tf_prob)
                batch_in_epoch += 1
                if _global_preempted(preempted):
                    logger.n_iter += 1  # this step counts (mirrors update())
                    _save_latest(epoch, batch_in_epoch, params, opt_state,
                                 best_val_meteor)
                    print("====> Preemption signal: saved mid-epoch "
                          f"checkpoint (epoch {epoch}, batch {batch_in_epoch})"
                          " — exiting; resume with --resume true")
                    return final_metrics
                if cfg.ckpt_iter and (logger.n_iter + 1) % cfg.ckpt_iter == 0:
                    ckpt.save_checkpoint(
                        ckpt.latest_path(cfg.save_path), params, opt_state,
                        {"epoch": epoch, "n_iter": logger.n_iter + 1,
                         "config": cfg.to_dict(),
                         "best_val_meteor_score": best_val_meteor,
                         "batch_in_epoch": batch_in_epoch})
                # lazy reservoir: only the few winning rows are fetched to
                # host, keeping the step loop free of per-batch device syncs
                # (unlike reference train.py:151). Multi-host: pred is global
                # and only this process's rows are addressable — read the
                # local block (aligned with this process's refs/vid_key) via
                # shard extraction, no collective.
                pred_local = None
                for j, (refs, vk) in enumerate(zip(batch["refs"],
                                                   batch["vid_key"])):
                    key = sampler.draw_key()
                    if sampler.would_accept(key):
                        if pred_local is None:
                            if jax.process_count() > 1:
                                from vcr_tpu.parallel.mesh import local_rows
                                pred_local = local_rows(pred)
                            else:
                                pred_local = pred
                        hyp = vocab.get_sent_from_index(
                            np.asarray(pred_local[j]))
                        sampler.add_with_key(
                            key, (hyp, refs[rnd.integers(len(refs))], vk))
                logger.update(m)
            skip_batches = 0  # only the first resumed epoch fast-forwards
            for k, v in timer.summary().items():
                logger.log_scalar(f"perf/{k}", v)

            with annotate("evaluate"):
                val_metrics, val_samples, time_taken = evaluate(
                    eval_step, params, val_it, vocab, log_keys, cfg.n_sample_sent,
                    cfg.seed, place, beam_fn)

            print("\n" + "*" * 34 + " TRAIN " + "*" * 34)
            print_sample_sents(sampler.get())
            print("*" * 75 + "\n")
            print("*" * 35 + " VAL " + "*" * 35)
            logger.log_valid(time_taken, val_metrics)
            for k in ("METEOR", "BLEU4", "CIDEr"):
                logger.log_scalar(f"val/{k}", val_metrics[k])
            print(f"Validation METEOR score: {val_metrics['METEOR']:.5f} "
                  f"(BLEU-4 {val_metrics['BLEU4']:.5f}, "
                  f"CIDEr {val_metrics['CIDEr']:.5f})")
            print_sample_sents(val_samples)
            print("")

            is_best = val_metrics["METEOR"] >= best_val_meteor  # >= (train.py:181)
            if is_best:
                best_val_meteor = val_metrics["METEOR"]
            with annotate("checkpoint"):
                manager.save_epoch(params, opt_state, epoch, logger.n_iter,
                                   cfg.to_dict(), val_metrics["METEOR"],
                                   best_val_meteor, is_best)
            final_metrics = val_metrics

            # signal landed during validation/checkpointing: the epoch
            # checkpoint above is already durable — exit cleanly here
            # (consensus again: all hosts must exit or none)
            if _global_preempted(preempted):
                print(f"====> Preemption signal: epoch {epoch} checkpoint "
                      "saved — exiting; resume with --resume true")
                return final_metrics

    return final_metrics
