#!/usr/bin/env python
"""Whole-run training-equivalence harness vs the ACTUAL reference code.

VERDICT r2 "Next round" #3: per-step lockstep (tests/test_train_equivalence.py)
proves identical step math on identical batches, but cannot see data-pipeline,
caption-sampling, or schedule-wiring divergence. This harness closes that gap
by driving the reference's real entry point (`/root/reference/driver.py
--mode train`, i.e. train.py:79-205 verbatim) and `vcr_tpu --mode train` on
the same tiny synthetic corpus, then comparing the full runs.

Environment shims for the reference process (it cannot run unmodified here):
  * nltk.word_tokenize -> TreebankWordTokenizer (punkt data absent offline;
    Treebank is the word-level tokenizer word_tokenize applies per sentence,
    so for single-sentence captions the shim is behavior-identical),
  * an `nlgeval` stub whose NLGEval.compute_individual_metrics returns
    vcr_tpu's METEOR 1.5 (the jar needs data files absent offline) — BOTH
    sides then score with the identical metric implementation,
  * torch.load defaults weights_only=False (the reference pickles an
    argparse.Namespace into its .net blobs; torch>=2.6 refuses by default).

Equivalence design (why the runs are comparable at all):
  * identical initial weights: the torch model's fresh state_dict is saved as
    a crafted `model_latest.net` (epoch=-1) that the reference resumes from,
    and converted (vcr_tpu/convert.py) into a vcr_tpu checkpoint that our
    loop resumes from;
  * one caption per video: dataset.py:80's random.choice is deterministic;
  * bsize >= corpus size: one full batch per epoch, and the masked loss
    (train_utils.py:37-54: per-sample token-mean, then batch-mean) plus its
    gradient are permutation-invariant, so DataLoader shuffle order is moot;
  * dropout 0, schedule_sample off (teacher forcing prob 1.0): no stochastic
    forward paths;
  * float32 on CPU on both sides.

Asserts:
  1. per-epoch train_loss / val_loss / val METEOR track to tolerance,
  2. final parameters match (reference state_dict vs our exported
     reference-format state_dict, tools.export_reference_checkpoint),
  3. the final vcr_tpu checkpoint decodes IDENTICALLY to the reference's own
     final checkpoint under the reference's evaluate() loop (run_iter argmax,
     train.py:32-44).

Usage:  python scripts/run_equivalence.py [--arch s2vt|s2vt-att|transformer]
        [--epochs N] [--workdir DIR] [--keep]
Exit 0 = equivalent; nonzero with a diff report otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# ---------------------------------------------------------------- bootstraps
# The reference must run in its own process (its modules are import-time
# stateful: device globals, `from utils import *`). Each bootstrap is written
# into the workdir and launched with subprocess; stdout is the artifact.

SHIMS = '''\
import os, sys, types
sys.path.insert(0, {repo!r})
import numpy as np
import torch

# nltk punkt data is absent offline; word_tokenize = punkt sentence split +
# Treebank word split, and captions are single sentences -> Treebank alone is
# behavior-identical (same tokenizer vcr_tpu uses, vcr_tpu/evals/metrics.py).
import nltk
from nltk.tokenize.treebank import TreebankWordTokenizer
_tb = TreebankWordTokenizer()
nltk.word_tokenize = lambda text, *a, **k: _tb.tokenize(text)

# nlgeval stub: the jar/its data files are unavailable offline. Both sides
# score with vcr_tpu's METEOR 1.5 so the metric cancels out of the diff.
from vcr_tpu.evals import metrics as _metrics
_nlg = types.ModuleType("nlgeval")
class NLGEval:
    def __init__(self, *a, **k):
        pass
    def compute_individual_metrics(self, ref, hyp):
        return {{"METEOR": _metrics.meteor15_score(hyp, list(ref))}}
_nlg.NLGEval = NLGEval
sys.modules["nlgeval"] = _nlg

# The reference TransformerNet hard-codes .cuda() on buffers/submodules
# (TransformerNet.py:133,167); on this CPU-only torch build make .cuda() a
# no-op so the reference runs as it would with CUDA, just on CPU.
if not torch.cuda.is_available():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

# The reference TransformerNet hard-codes dropout=0.1 inside every sublayer
# (TransformerNet.py:15,76,137,155) — no flag can disable it, and dropout
# noise is not seed-matchable across frameworks. Whole-run equivalence
# therefore runs with ALL dropout off on both sides (the vcr_tpu bootstrap
# sets INTERNAL_DROPOUT=0, mirroring tests/test_train_equivalence.py:208);
# with --dropout_p 0 this is a no-op for the RNN families.
torch.nn.Dropout.forward = lambda self, x: x

# RationaleNet draws fresh Gumbel noise every forward (RationaleNet.py:49-50);
# like dropout, that stream is not seed-matchable across frameworks. Whole-run
# rationale equivalence therefore runs both sides in ZERO-NOISE mode: this
# patch makes F.gumbel_softmax deterministic (softmax(logits/tau); hard =
# straight-through one-hot, exactly torch's formula with gumbels = 0), and
# the vcr_tpu bootstrap sets nn.gumbel.ZERO_NOISE = True. The stochastic
# per-step math is proven by the shared-drawn-noise lockstep test
# (tests/test_train_equivalence.py RationaleNet). No-op for other archs.
import torch.nn.functional as _F
def _zero_noise_gumbel(logits, tau=1.0, hard=False, eps=1e-10, dim=-1):
    y_soft = (logits / tau).softmax(dim)
    if hard:
        index = y_soft.max(dim, keepdim=True)[1]
        y_hard = torch.zeros_like(y_soft).scatter_(dim, index, 1.0)
        return y_hard - y_soft.detach() + y_soft
    return y_soft
_F.gumbel_softmax = _zero_noise_gumbel

# torchvision is not installed here; train.py/dataset.py import it at module
# scope but the caption families never call into it (imports only feed the
# feature-extraction modes, which this harness does not run).
try:
    import torchvision  # noqa: F401
except ImportError:
    _tv = types.ModuleType("torchvision")
    for _sub in ("datasets", "transforms"):
        _m = types.ModuleType("torchvision." + _sub)
        setattr(_tv, _sub, _m)
        sys.modules["torchvision." + _sub] = _m
    sys.modules["torchvision"] = _tv

# torch>=2.6 defaults weights_only=True; the reference pickles argparse
# Namespaces into its .net blobs (train.py:195-205).
_orig_load = torch.load
def _load(*a, **k):
    k.setdefault("weights_only", False)
    return _orig_load(*a, **k)
torch.load = _load

sys.path.insert(0, {ref!r})
sys.argv = ["driver.py"] + {flags!r}
from args import get_args
opts = get_args()
from utils import set_random_seeds, GloveLoader
set_random_seeds(opts.seed)
glove_loader = GloveLoader(os.path.join(opts.data_dir, opts.corpus, "glove",
                                        opts.glove_emb_file))

def build_model():
    if opts.mode == "train_spatial":
        # SpatialNet wraps the base captioner (train_spatial.py:89)
        from model.SpatialNet import SpatialNet
        return SpatialNet(glove_loader, opts.dropout_p, opts.hidden_size,
                          opts.vid_feat_size, opts.max_len, opts.arch)
    if opts.mode == "train_rationale":
        # RationaleNet wraps the base captioner (train_rationale.py:109)
        from model.RationaleNet import RationaleNet
        return RationaleNet(glove_loader, opts.dropout_p, opts.hidden_size,
                            opts.vid_feat_size, opts.max_len, opts.tau,
                            opts.arch, None)
    if opts.arch == "s2vt":
        from model.S2VTModel import S2VTModel
        return S2VTModel(glove_loader, opts.dropout_p, opts.hidden_size,
                         opts.vid_feat_size, opts.max_len)
    if opts.arch == "s2vt-att":
        from model.S2VTAttModel import S2VTAttModel
        return S2VTAttModel(glove_loader, opts.dropout_p, opts.hidden_size,
                            opts.vid_feat_size, opts.max_len)
    if opts.arch == "transformer":
        from model.TransformerNet import Transformer
        return Transformer(glove_loader, opts.dropout_p, opts.hidden_size,
                           opts.vid_feat_size, opts.max_len, 6, 8)
    raise NotImplementedError(opts.arch)
'''

REF_TRAIN = SHIMS + '''\

# Inject the initial weights through the reference's own resume path
# (train.py:125-134: loads state_dict/n_iter/opts, starts at epoch+1).
model = build_model()
os.makedirs(opts.save_path, exist_ok=True)
torch.save(model.state_dict(), {init_sd!r})
torch.save({{"epoch": -1, "state_dict": model.state_dict(), "optimizer": {{}},
            "n_iter": 0, "opts": opts, "val_meteor_score": 0.0,
            "best_val_meteor_score": 0.0}},
           os.path.join(opts.save_path, "model_latest.net"))

# driver.py's --mode train path is exactly set_random_seeds(opts.seed) then
# train(opts) (driver.py:19-20,40-41) — but importing driver pulls the feature
# -extraction modules (skimage/cv2, absent offline), so call train() directly.
# train_spatial follows the same driver pattern (driver.py train_spatial).
set_random_seeds(opts.seed)
if opts.mode == "train_spatial":
    from train_spatial import train_spatial as train
elif opts.mode == "train_rationale":
    from train_rationale import train_rationale as train
else:
    from train import train
train(opts)
'''

REF_EVAL = SHIMS + '''\

# Decode both final checkpoints under the reference's own eval loop
# (train.py:47-78 evaluate / train.py:32-44 run_iter argmax) and emit the
# hypotheses + scores for the parent to compare.
import json
import torch.nn as nn
from torch.utils.data import DataLoader
from dataset import MSVideoDescriptionDataset, collate_fn

if opts.mode == "train_spatial":
    import train_spatial as ref_train   # run_iter: model(vid_feats, s) pair
    feat_type = "yolo"                  # dataset.py:57 -> bbox_feats/
elif opts.mode == "train_rationale":
    import train_rationale as ref_train  # run_iter returns 7 values w/ pred
    feat_type = "cnn"
else:
    import train as ref_train
    feat_type = "cnn"

valid_loader = DataLoader(
    MSVideoDescriptionDataset(opts.data_dir, opts.corpus, "val", glove_loader,
                              opts.num_frames, opts.max_len, feat_type),
    batch_size=opts.bsize, shuffle=False, num_workers=0, collate_fn=collate_fn)
criterion = nn.CrossEntropyLoss(reduction="none")

results = {{}}
for name, path in [("reference", {ref_final!r}), ("vcr_tpu", {ours_final!r})]:
    model = build_model()
    blob = torch.load(path, map_location="cpu")
    model.load_state_dict({{k: v.float() for k, v in blob["state_dict"].items()}})
    model.eval()
    hyps, losses = [], []
    with torch.no_grad():
        for data in valid_loader:
            # caption/spatial run_iter returns (acc, loss, pred); rationale
            # returns (acc, loss, loss_ce, loss_brev, loss_cont, len, pred)
            out = ref_train.run_iter(opts, data, model, criterion,
                                     return_pred=True)
            loss, pred = out[1], out[-1]
            hyps += list(glove_loader.get_sents_from_indexes(
                pred.data.cpu().numpy()))
            losses.append(float(loss))
    results[name] = {{"hyps": hyps, "val_loss": sum(losses) / len(losses)}}
print("EQRESULT " + json.dumps(results))
'''

OURS_TRAIN = '''\
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import torch

from vcr_tpu.config import get_config
from vcr_tpu import convert
from vcr_tpu.models.base import spec_from_config
from vcr_tpu.train import checkpoint as ckpt
from vcr_tpu.train.optim import build_optimizer
from vcr_tpu.vocab import Vocab

argv = {flags!r}
cfg = get_config(argv)
vocab = Vocab(os.path.join(cfg.data_dir, cfg.corpus, "glove",
                           cfg.glove_emb_file), seed=cfg.seed)
spec = spec_from_config(cfg, vocab)
sd = torch.load({init_sd!r}, map_location="cpu", weights_only=True)
conv_arch = ("spatial" if cfg.mode == "train_spatial"
             else "rationale" if cfg.mode == "train_rationale" else cfg.arch)
params = convert.convert_state_dict(sd, spec, conv_arch)
opt = build_optimizer(cfg.optim, cfg.lr, cfg.wd, cfg.max_norm, cfg.momentum)
opt_state = opt.init(params)
ckpt.save_checkpoint(ckpt.latest_path(cfg.save_path), params, opt_state,
                     {{"epoch": -1, "n_iter": 0, "config": cfg.to_dict(),
                      "val_meteor_score": 0.0, "best_val_meteor_score": 0.0}})

# mirror the reference bootstrap's Dropout no-op (see its comment): the
# reference hard-codes internal transformer dropout 0.1 that no flag disables
import vcr_tpu.models.transformer as _tr
_tr.INTERNAL_DROPOUT = 0.0
# mirror the reference bootstrap's zero-noise F.gumbel_softmax (see its
# comment): rationale whole-run equivalence runs both sides noise-free
import vcr_tpu.nn.gumbel as _gum
_gum.ZERO_NOISE = True

from vcr_tpu.cli import main
main(argv)

# export the final checkpoint in reference .net format for the decode check
from vcr_tpu.tools import export_reference_checkpoint
out = export_reference_checkpoint(cfg, ckpt.latest_path(cfg.save_path),
                                  out_file={ours_final!r})
print("exported", out)
'''

# ------------------------------------------------------------------ helpers

_TRAIN_RE = re.compile(
    r"epoch: (\d+), updates: \d+, time: [\d.]+, train_acc: ([\d.-]+), "
    r"train_loss: ([\d.-]+)")
_VAL_RE = re.compile(
    r"epoch: (\d+), updates: \d+, time: [\d.]+, val_acc: ([\d.-]+), "
    r"val_loss: ([\d.-]+)")
_METEOR_RE = re.compile(r"Validation METEOR score: ([\d.-]+)")


def parse_log(text: str):
    train = {int(m[1]): float(m[3]) for m in _TRAIN_RE.finditer(text)}
    val = {int(m[1]): float(m[3]) for m in _VAL_RE.finditer(text)}
    meteor = [float(m[1]) for m in _METEOR_RE.finditer(text)]
    return train, val, meteor


def run(label: str, src: str, workdir: str, log_name: str) -> str:
    path = os.path.join(workdir, label + ".py")
    with open(path, "w") as f:
        f.write(src)
    env = dict(os.environ, JAX_PLATFORMS="cpu", CUDA_VISIBLE_DEVICES="")
    proc = subprocess.run([sys.executable, path], cwd=workdir, env=env,
                          capture_output=True, text=True, timeout=1800)
    log = os.path.join(workdir, log_name)
    with open(log, "w") as f:
        f.write(proc.stdout + "\n--- stderr ---\n" + proc.stderr)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:])
        raise RuntimeError(f"{label} exited {proc.returncode} (log: {log})")
    return proc.stdout


def compare_final_params(ref_net: str, ours_net: str):
    import numpy as np
    import torch
    ref = torch.load(ref_net, map_location="cpu", weights_only=False)
    ours = torch.load(ours_net, map_location="cpu", weights_only=False)
    rsd, osd = ref["state_dict"], ours["state_dict"]
    missing = sorted(set(rsd) ^ set(osd))
    assert not missing, f"state_dict key mismatch: {missing}"
    worst, worst_key = 0.0, ""
    for k in rsd:
        a = rsd[k].float().numpy()
        b = osd[k].float().numpy()
        d = float(np.max(np.abs(a - b))) if a.size else 0.0
        if d > worst:
            worst, worst_key = d, k
    return worst, worst_key


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="s2vt",
                    choices=["s2vt", "s2vt-att", "transformer", "spatial",
                             "rationale"])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--loss_tol", type=float, default=2e-3)
    ap.add_argument("--meteor_tol", type=float, default=5e-3)
    # Final-param tolerance is arch-dependent: the RNN families settle at
    # ~1e-6..4e-5 after 10 epochs, but the transformer runs at REAL widths
    # (4096/300, 6 layers) where torch-CPU and XLA-CPU reduction orders
    # differ in every matmul/layernorm and the tiny-corpus loss landscape is
    # chaotic (loss bounces 1.1<->1.5 by epoch 8) — measured drift is ~5e-3
    # while losses still track to 2e-4 and decodes stay identical. The
    # per-step math itself is proven to 2e-5 by the opt-in real-width
    # lockstep test (tests/test_train_equivalence.py:385).
    ap.add_argument("--param_tol", type=float, default=None)
    args = ap.parse_args(argv)
    if args.param_tol is None:
        args.param_tol = 2e-2 if args.arch == "transformer" else 5e-4

    workdir = args.workdir or tempfile.mkdtemp(prefix="run_eq_")
    os.makedirs(workdir, exist_ok=True)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from util_corpus import build_corpus

    # The reference Transformer hard-codes 4096-d video feats / 300-d glove
    # internally (TransformerNet.py Norm widths; PARITY.md "Known
    # deviations"), so the transformer run must use real widths; the RNN
    # families run tiny.
    if args.arch == "transformer":
        hidden, feat_dim, glove_dim = 512, 4096, 300
    else:
        hidden, feat_dim, glove_dim = 16, 12, 16
    # "spatial" = --mode train_spatial over an s2vt base (train_spatial.py:89)
    # on YOLO grid features (bbox_feats .npy, dataset.py:57);
    # "rationale" = --mode train_rationale over an s2vt base in zero-noise
    # Gumbel mode (see the bootstrap patches; stochastic per-step math is
    # proven by the shared-noise lockstep test)
    mode, arch, feat_type = "train", args.arch, "cnn"
    if args.arch == "spatial":
        mode, arch, feat_type = "train_spatial", "s2vt", "bbox"
        feat_dim = 8
    elif args.arch == "rationale":
        mode, arch = "train_rationale", "s2vt"
    data_dir = os.path.join(workdir, "data")
    build_corpus(data_dir, num_videos=6, num_frames=4, feat_dim=feat_dim,
                 glove_dim=glove_dim, captions_per_video=1,
                 feat_type=feat_type, grid=4)

    common = ["--mode", mode, "--arch", arch,
              "--data_dir", data_dir, "--corpus", "msvd_vgg",
              "--glove_emb_file", "glove_tiny.txt",
              "--num_frames", "4", "--vid_feat_size", str(feat_dim),
              "--max_len", "6", "--hidden_size", str(hidden),
              "--bsize", "6", "--nworkers", "0",
              "--dropout_p", "0.0", "--schedule_sample", "false",
              "--lr", "2e-3", "--wd", "4e-5", "--max_norm", "1.0",
              "--epochs", str(args.epochs), "--seed", "123",
              "--log_iter", "1", "--n_sample_sent", "2",
              "--tau", "1.0", "--lambda_brev", "1.0", "--lambda_cont", "1.0",
              "--resume", "true"]

    ref_save = os.path.join(workdir, "ref_models")
    ours_save = os.path.join(workdir, "jax_models")
    init_sd = os.path.join(workdir, "init_state.pt")
    ref_final = os.path.join(ref_save, "model_latest.net")
    ours_final = os.path.join(workdir, "vcr_export.net")

    ref_flags = common + ["--save_path", ref_save,
                          "--log_dir", os.path.join(workdir, "ref_logs")]
    ours_flags = common + ["--save_path", ours_save, "--log_dir", "",
                           "--compute_dtype", "float32"]

    print(f"[run_equivalence] arch={args.arch} epochs={args.epochs} "
          f"workdir={workdir}")
    ref_out = run("ref_train",
                  REF_TRAIN.format(repo=REPO, ref=REFERENCE, flags=ref_flags,
                                   init_sd=init_sd),
                  workdir, "ref_train.log")
    print("[run_equivalence] reference run done")
    ours_out = run("ours_train",
                   OURS_TRAIN.format(repo=REPO, flags=ours_flags,
                                     init_sd=init_sd, ours_final=ours_final),
                   workdir, "ours_train.log")
    print("[run_equivalence] vcr_tpu run done")

    rt, rv, rm = parse_log(ref_out)
    ot, ov, om = parse_log(ours_out)
    failures = []
    if not (rt and rv and rm and ot and ov and om):
        failures.append(
            "log parsing came up empty on some stream "
            f"(ref t/v/m: {len(rt)}/{len(rv)}/{len(rm)}, "
            f"ours: {len(ot)}/{len(ov)}/{len(om)}) — regexes vs log format?")
    epochs = sorted(rt)
    if sorted(ot) != epochs:
        failures.append(f"epoch sets differ: ref {sorted(rt)} vs ours {sorted(ot)}")
    print(f"{'ep':>3} {'ref_train':>10} {'vcr_train':>10} {'ref_val':>10} "
          f"{'vcr_val':>10} {'ref_MET':>8} {'vcr_MET':>8}")
    for e in epochs:
        tm = rm[e] if e < len(rm) else float("nan")
        o_tm = om[e] if e < len(om) else float("nan")
        print(f"{e:>3} {rt[e]:>10.5f} {ot.get(e, float('nan')):>10.5f} "
              f"{rv.get(e, float('nan')):>10.5f} {ov.get(e, float('nan')):>10.5f} "
              f"{tm:>8.5f} {o_tm:>8.5f}")
        for tag, a, b, tol in [("train_loss", rt.get(e), ot.get(e), args.loss_tol),
                               ("val_loss", rv.get(e), ov.get(e), args.loss_tol),
                               ("METEOR", tm, o_tm, args.meteor_tol)]:
            # `not (<= tol)` rather than `> tol`: a NaN (unparsed METEOR
            # line) must FAIL, not silently pass the inverted comparison
            if a is None or b is None or not (abs(a - b) <= tol):
                failures.append(f"epoch {e} {tag}: ref {a} vs ours {b}")

    worst, worst_key = compare_final_params(ref_final, ours_final)
    print(f"[run_equivalence] final params max |diff| = {worst:.3e} ({worst_key})")
    if worst > args.param_tol:
        failures.append(f"final params diverged: {worst:.3e} at {worst_key}")

    eval_out = run("ref_eval",
                   REF_EVAL.format(repo=REPO, ref=REFERENCE, flags=ref_flags,
                                   ref_final=ref_final, ours_final=ours_final),
                   workdir, "ref_eval.log")
    res = json.loads(eval_out.split("EQRESULT ", 1)[1].splitlines()[0])
    ref_hyps, our_hyps = res["reference"]["hyps"], res["vcr_tpu"]["hyps"]
    same = sum(a == b for a, b in zip(ref_hyps, our_hyps))
    print(f"[run_equivalence] reference-eval decode: {same}/{len(ref_hyps)} "
          f"identical hypotheses; val_loss ref {res['reference']['val_loss']:.6f} "
          f"vs ours-ckpt {res['vcr_tpu']['val_loss']:.6f}")
    if same != len(ref_hyps):
        for a, b in zip(ref_hyps, our_hyps):
            if a != b:
                print(f"  DIFF: ref={a!r} ours={b!r}")
        failures.append(f"decode mismatch: {len(ref_hyps) - same} hyps differ")
    if abs(res["reference"]["val_loss"] - res["vcr_tpu"]["val_loss"]) > args.loss_tol:
        failures.append("reference-eval val_loss on the two checkpoints differs")

    if failures:
        print("[run_equivalence] FAIL")
        for f in failures:
            print("  -", f)
        return 1
    print(f"[run_equivalence] PASS — {args.arch}: {args.epochs} epochs "
          f"equivalent end-to-end (loss curves, METEOR, final params "
          f"max|d|={worst:.1e}, {same}/{len(ref_hyps)} identical decodes)")
    if not args.keep and not args.workdir:
        shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
