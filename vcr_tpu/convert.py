"""Convert reference PyTorch checkpoints into vcr_tpu parameter trees.

The reference saves ``{'state_dict': model.state_dict(), ...}`` via torch.save
(train.py:183-205). These converters map every reference model family's
state_dict onto this framework's param pytrees so trained reference models
decode token-for-token here (BASELINE.md decode-parity target):

* S2VTModel        (model/S2VTModel.py:37-49)
* S2VTAttModel     (model/S2VTAttModel.py:50-123)
* Transformer      (model/TransformerNet.py:182-222)
* RationaleNet     (model/RationaleNet.py:26-84)
* SpatialNet       (model/SpatialNet.py:76-84)

Conventions: torch Linear stores (out, in) — ours is (in, out), so weights
transpose; torch GRU/LSTM gate matrices (gates, in) -> (in, gates); BatchNorm
weight/bias/running_mean/running_var -> scale/bias/mean/var. Vocab-sized
tensors are zero-padded up to spec.padded_vocab_size.

Weights may be torch tensors or numpy arrays (state_dicts load fine with
``torch.load(..., map_location='cpu')``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vcr_tpu.models.base import ModelSpec


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    # copy=True: tensor.numpy() ALIASES torch storage, and torch optimizers
    # mutate parameters in place — a converted param tree must be a snapshot,
    # not a live view (caught by tests/test_train_equivalence.py).
    return np.array(v, dtype=np.float32, copy=True)


def _lin(sd: Dict, prefix: str, pad_out_to: int | None = None) -> Dict:
    w = _np(sd[prefix + ".weight"]).T  # (in, out)
    p = {"w": w}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    if pad_out_to is not None and pad_out_to > w.shape[1]:
        extra = pad_out_to - w.shape[1]
        p["w"] = np.concatenate([p["w"], np.zeros((w.shape[0], extra), np.float32)],
                                axis=1)
        if "b" in p:
            p["b"] = np.concatenate([p["b"], np.full((extra,), 0.0, np.float32)])
    return {k: jnp.asarray(v) for k, v in p.items()}


def _rnn(sd: Dict, prefix: str, suffix: str = "") -> Dict:
    return {
        "w_ih": jnp.asarray(_np(sd[f"{prefix}.weight_ih_l0{suffix}"]).T),
        "w_hh": jnp.asarray(_np(sd[f"{prefix}.weight_hh_l0{suffix}"]).T),
        "b_ih": jnp.asarray(_np(sd[f"{prefix}.bias_ih_l0{suffix}"])),
        "b_hh": jnp.asarray(_np(sd[f"{prefix}.bias_hh_l0{suffix}"])),
    }


def _embedding(sd: Dict, key: str, padded_size: int) -> Dict:
    table = _np(sd[key])
    if padded_size > table.shape[0]:
        pad = np.zeros((padded_size - table.shape[0], table.shape[1]), np.float32)
        table = np.concatenate([table, pad], axis=0)
    return {"table": jnp.asarray(table)}


def _bn(sd: Dict, prefix: str) -> Dict:
    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"])),
            "mean": jnp.asarray(_np(sd[prefix + ".running_mean"])),
            "var": jnp.asarray(_np(sd[prefix + ".running_var"]))}


def _bahdanau(sd: Dict, prefix: str) -> Dict:
    return {"key_layer": _lin(sd, prefix + ".key_layer"),
            "query_layer": _lin(sd, prefix + ".query_layer"),
            "energy_layer": _lin(sd, prefix + ".energy_layer")}


def _strip(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------- captioners

def convert_s2vt(sd: Dict, spec: ModelSpec) -> Dict:
    return {
        "embedding": _embedding(sd, "embedding.0.weight", spec.padded_vocab_size),
        "rnn1": _rnn(sd, "rnn1"),
        "rnn2": _rnn(sd, "rnn2"),
        "linear": _lin(sd, "linear.1", spec.padded_vocab_size),
    }


def convert_s2vt_att(sd: Dict, spec: ModelSpec) -> Dict:
    return {
        "encoder": {"rnn": _rnn(sd, "encoder.rnn")},
        "decoder": {
            "embedding": _embedding(sd, "decoder.embedding.weight",
                                    spec.padded_vocab_size),
            "rnn": _rnn(sd, "decoder.rnn"),
            "attention": _bahdanau(sd, "decoder.attention"),
            "pred_linear": _lin(sd, "decoder.pred_linear.1", spec.padded_vocab_size),
        },
    }


def _mha(sd: Dict, prefix: str) -> Dict:
    return {"q": _lin(sd, prefix + ".q_linear"), "k": _lin(sd, prefix + ".k_linear"),
            "v": _lin(sd, prefix + ".v_linear"), "out": _lin(sd, prefix + ".out")}


def _norm(sd: Dict, prefix: str) -> Dict:
    return {"alpha": jnp.asarray(_np(sd[prefix + ".alpha"])),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _ff(sd: Dict, prefix: str) -> Dict:
    return {"linear_1": _lin(sd, prefix + ".linear_1"),
            "linear_2": _lin(sd, prefix + ".linear_2")}


def convert_transformer(sd: Dict, spec: ModelSpec) -> Dict:
    import jax

    def stack(layer_dicts):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_dicts)

    n = spec.tf_layers
    enc_layers = [{
        "norm_1": _norm(sd, f"encoder.layers.{i}.norm_1"),
        "norm_2": _norm(sd, f"encoder.layers.{i}.norm_2"),
        "attn": _mha(sd, f"encoder.layers.{i}.attn"),
        "ff": _ff(sd, f"encoder.layers.{i}.ff"),
    } for i in range(n)]
    dec_layers = [{
        "norm_1": _norm(sd, f"decoder.layers.{i}.norm_1"),
        "norm_2": _norm(sd, f"decoder.layers.{i}.norm_2"),
        "norm_3": _norm(sd, f"decoder.layers.{i}.norm_3"),
        "attn_1": _mha(sd, f"decoder.layers.{i}.attn_1"),
        "attn_2": _mha(sd, f"decoder.layers.{i}.attn_2"),
        "ff": _ff(sd, f"decoder.layers.{i}.ff"),
    } for i in range(n)]

    from vcr_tpu.models.transformer import make_positional_encoding

    enc_pe = (_np(sd["encoder.pe.pe"])[0] if "encoder.pe.pe" in sd
              else make_positional_encoding(spec.vid_feat_size))
    dec_pe = (_np(sd["decoder.pe.pe"])[0] if "decoder.pe.pe" in sd
              else make_positional_encoding(spec.embed_size))
    return {
        "encoder": {"pe": jnp.asarray(enc_pe), "layers": stack(enc_layers),
                    "norm": _norm(sd, "encoder.norm")},
        "decoder": {
            "embedding": _embedding(sd, "decoder.embedding.weight",
                                    spec.padded_vocab_size),
            "pe": jnp.asarray(dec_pe),
            "layers": stack(dec_layers),
            "norm": _norm(sd, "decoder.norm"),
            "norm_out": _norm(sd, "decoder.norm_out"),
            "pred_linear": _lin(sd, "decoder.pred_linear.1", spec.padded_vocab_size),
        },
    }


# ---------------------------------------------------------------- wrappers

def convert_rationale(sd: Dict, spec: ModelSpec) -> Dict:
    cap_sd = _strip(sd, "caption_net.")
    cap = (convert_s2vt(cap_sd, spec) if spec.base_arch == "s2vt"
           else convert_s2vt_att(cap_sd, spec))
    return {
        "caption_net": cap,
        "gen": {
            "rnn": {"fwd": _rnn(sd, "gen.rnn"),
                    "bwd": _rnn(sd, "gen.rnn", suffix="_reverse")},
            "linear": _lin(sd, "gen.linear"),
        },
    }


def convert_spatial(sd: Dict, spec: ModelSpec) -> Dict:
    cap_sd = _strip(sd, "caption_net.")
    cap = (convert_s2vt(cap_sd, spec) if spec.base_arch == "s2vt"
           else convert_s2vt_att(cap_sd, spec))
    return {
        "caption_net": cap,
        "conv1": {"w": jnp.asarray(_np(sd["conv.0.weight"])),
                  "b": jnp.asarray(_np(sd["conv.0.bias"]))},
        "bn1": _bn(sd, "conv.1"),
        "conv2": {"w": jnp.asarray(_np(sd["conv.3.weight"])),
                  "b": jnp.asarray(_np(sd["conv.3.bias"]))},
        "bn2": _bn(sd, "conv.4"),
        "attention": _bahdanau(sd, "attention"),
    }


CONVERTERS = {
    "s2vt": convert_s2vt,
    "s2vt-att": convert_s2vt_att,
    "transformer": convert_transformer,
    "rationale": convert_rationale,
    "spatial": convert_spatial,
}


def convert_state_dict(sd: Dict, spec: ModelSpec, arch: str) -> Dict:
    return CONVERTERS[arch](sd, spec)


# ---------------------------------------------------------------- export

def _lin_out(p, prefix: str, out: Dict, vocab_size: int | None = None) -> None:
    w = np.asarray(p["w"]).T  # back to torch (out, in)
    b = np.asarray(p["b"]) if "b" in p else None
    if vocab_size is not None:  # strip vocab padding columns
        w = w[:vocab_size]
        b = b[:vocab_size] if b is not None else None
    out[prefix + ".weight"] = w
    if b is not None:
        out[prefix + ".bias"] = b


def _rnn_out(p, prefix: str, out: Dict, suffix: str = "") -> None:
    out[f"{prefix}.weight_ih_l0{suffix}"] = np.asarray(p["w_ih"]).T
    out[f"{prefix}.weight_hh_l0{suffix}"] = np.asarray(p["w_hh"]).T
    out[f"{prefix}.bias_ih_l0{suffix}"] = np.asarray(p["b_ih"])
    out[f"{prefix}.bias_hh_l0{suffix}"] = np.asarray(p["b_hh"])


def export_s2vt(params: Dict, spec: ModelSpec) -> Dict:
    """vcr_tpu S2VT params -> a reference-format state_dict (numpy arrays;
    torch.load-compatible after tensor conversion). Inverse of convert_s2vt —
    lets models trained here run in the PyTorch reference unchanged."""
    out: Dict = {}
    out["embedding.0.weight"] = np.asarray(
        params["embedding"]["table"])[: spec.vocab_size]
    _rnn_out(params["rnn1"], "rnn1", out)
    _rnn_out(params["rnn2"], "rnn2", out)
    _lin_out(params["linear"], "linear.1", out, spec.vocab_size)
    return out


def export_s2vt_att(params: Dict, spec: ModelSpec) -> Dict:
    out: Dict = {}
    _rnn_out(params["encoder"]["rnn"], "encoder.rnn", out)
    dec = params["decoder"]
    out["decoder.embedding.weight"] = np.asarray(
        dec["embedding"]["table"])[: spec.vocab_size]
    _rnn_out(dec["rnn"], "decoder.rnn", out)
    for name in ("key_layer", "query_layer", "energy_layer"):
        _lin_out(dec["attention"][name], f"decoder.attention.{name}", out)
    _lin_out(dec["pred_linear"], "decoder.pred_linear.1", out, spec.vocab_size)
    return out


def _norm_out(p, prefix: str, out: Dict) -> None:
    out[prefix + ".alpha"] = np.asarray(p["alpha"])
    out[prefix + ".bias"] = np.asarray(p["bias"])


def _mha_out(p, prefix: str, out: Dict) -> None:
    _lin_out(p["q"], prefix + ".q_linear", out)
    _lin_out(p["k"], prefix + ".k_linear", out)
    _lin_out(p["v"], prefix + ".v_linear", out)
    _lin_out(p["out"], prefix + ".out", out)


def _ff_out(p, prefix: str, out: Dict) -> None:
    _lin_out(p["linear_1"], prefix + ".linear_1", out)
    _lin_out(p["linear_2"], prefix + ".linear_2", out)


def export_transformer(params: Dict, spec: ModelSpec) -> Dict:
    """Inverse of convert_transformer: unstack the scanned layer pytrees back
    into per-layer reference keys (TransformerNet.py naming); the PE buffers
    are emitted with torch's (1, L, d) buffer shape."""
    import jax

    out: Dict = {}
    enc, dec = params["encoder"], params["decoder"]

    def unstack(stacked, i):
        return jax.tree_util.tree_map(lambda a: a[i], stacked)

    for i in range(spec.tf_layers):
        lp = unstack(enc["layers"], i)
        _norm_out(lp["norm_1"], f"encoder.layers.{i}.norm_1", out)
        _norm_out(lp["norm_2"], f"encoder.layers.{i}.norm_2", out)
        _mha_out(lp["attn"], f"encoder.layers.{i}.attn", out)
        _ff_out(lp["ff"], f"encoder.layers.{i}.ff", out)
        lp = unstack(dec["layers"], i)
        _norm_out(lp["norm_1"], f"decoder.layers.{i}.norm_1", out)
        _norm_out(lp["norm_2"], f"decoder.layers.{i}.norm_2", out)
        _norm_out(lp["norm_3"], f"decoder.layers.{i}.norm_3", out)
        _mha_out(lp["attn_1"], f"decoder.layers.{i}.attn_1", out)
        _mha_out(lp["attn_2"], f"decoder.layers.{i}.attn_2", out)
        _ff_out(lp["ff"], f"decoder.layers.{i}.ff", out)
    out["encoder.pe.pe"] = np.asarray(enc["pe"])[None]
    out["decoder.pe.pe"] = np.asarray(dec["pe"])[None]
    _norm_out(enc["norm"], "encoder.norm", out)
    out["decoder.embedding.weight"] = np.asarray(
        dec["embedding"]["table"])[: spec.vocab_size]
    _norm_out(dec["norm"], "decoder.norm", out)
    _norm_out(dec["norm_out"], "decoder.norm_out", out)
    _lin_out(dec["pred_linear"], "decoder.pred_linear.1", out, spec.vocab_size)
    return out


def _bn_out(p, prefix: str, out: Dict) -> None:
    out[prefix + ".weight"] = np.asarray(p["scale"])
    out[prefix + ".bias"] = np.asarray(p["bias"])
    out[prefix + ".running_mean"] = np.asarray(p["mean"])
    out[prefix + ".running_var"] = np.asarray(p["var"])
    # torch BatchNorm state_dicts carry this counter (one increment per train
    # forward; only consulted when momentum=None, which the reference never
    # uses). Emit 0 for strict loads; tools.export_reference_checkpoint
    # overwrites it with the checkpoint's n_iter so whole-run exports match
    # the reference's counter exactly.
    out[prefix + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _prefixed(sd: Dict, prefix: str) -> Dict:
    return {prefix + k: v for k, v in sd.items()}


def _export_base(params: Dict, spec: ModelSpec) -> Dict:
    exp = export_s2vt if spec.base_arch == "s2vt" else export_s2vt_att
    return _prefixed(exp(params["caption_net"], spec), "caption_net.")


def export_rationale(params: Dict, spec: ModelSpec) -> Dict:
    """Inverse of convert_rationale (reference RationaleNet.py naming)."""
    out = _export_base(params, spec)
    _rnn_out(params["gen"]["rnn"]["fwd"], "gen.rnn", out)
    _rnn_out(params["gen"]["rnn"]["bwd"], "gen.rnn", out, suffix="_reverse")
    _lin_out(params["gen"]["linear"], "gen.linear", out)
    return out


def export_spatial(params: Dict, spec: ModelSpec) -> Dict:
    """Inverse of convert_spatial (reference SpatialNet.py nn.Sequential
    conv-trunk indices: conv.0/conv.3 convs, conv.1/conv.4 BatchNorms)."""
    out = _export_base(params, spec)
    out["conv.0.weight"] = np.asarray(params["conv1"]["w"])
    out["conv.0.bias"] = np.asarray(params["conv1"]["b"])
    _bn_out(params["bn1"], "conv.1", out)
    out["conv.3.weight"] = np.asarray(params["conv2"]["w"])
    out["conv.3.bias"] = np.asarray(params["conv2"]["b"])
    _bn_out(params["bn2"], "conv.4", out)
    for name in ("key_layer", "query_layer", "energy_layer"):
        _lin_out(params["attention"][name], f"attention.{name}", out)
    return out


EXPORTERS = {
    "s2vt": export_s2vt,
    "s2vt-att": export_s2vt_att,
    "transformer": export_transformer,
    "rationale": export_rationale,
    "spatial": export_spatial,
}


def export_state_dict(params: Dict, spec: ModelSpec, arch: str) -> Dict:
    return EXPORTERS[arch](params, spec)


def detect_arch(sd: Dict) -> str:
    """Infer the reference model family from state_dict key structure."""
    keys = set(sd.keys())
    if any(k.startswith("gen.rnn.") for k in keys):
        return "rationale"
    if "conv.0.weight" in keys and any(k.startswith("caption_net.") for k in keys):
        return "spatial"
    if any(k.startswith("encoder.layers.0.attn.q_linear") for k in keys):
        return "transformer"
    if any(k.startswith("decoder.attention.") for k in keys):
        return "s2vt-att"
    return "s2vt"


def detect_base_arch(sd: Dict) -> Optional[str]:
    """For wrapped families (rationale/spatial): which captioner is inside.
    The caption_net.* keys are unambiguous — S2VTAttModel has encoder./
    decoder. submodules, S2VTModel has rnn1/rnn2. None for unwrapped sds."""
    if not any(k.startswith("caption_net.") for k in sd):
        return None
    if any(k.startswith("caption_net.decoder.attention.") for k in sd):
        return "s2vt-att"
    return "s2vt"


def load_reference_checkpoint(path: str, spec: ModelSpec, arch: str):
    """Load a reference ``model_{latest,best}.net`` torch.save file and
    convert it (the dict layout is {'state_dict', 'opts', 'epoch', 'n_iter',
    ...}, reference train.py:183-205). Returns (params, meta) where meta holds
    everything but the weights. Requires torch for unpickling."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob["state_dict"]
    detected = detect_arch(sd)
    if detected != arch and detected in ("rationale", "spatial"):
        arch = detected  # wrapped families are unambiguous from the keys
    base = detect_base_arch(sd)
    if base is not None and base != spec.base_arch:
        # the wrapped captioner's family is also unambiguous: a reference
        # RationaleNet(s2vt-att) checkpoint loaded with a default-s2vt spec
        # would otherwise die in convert_s2vt with KeyError 'rnn1...'
        spec = spec.with_(base_arch=base)
    params = convert_state_dict(sd, spec, arch)
    meta = {k: v for k, v in blob.items() if k != "state_dict"}
    meta["detected_arch"] = detected
    meta["detected_base_arch"] = base
    return params, meta
