"""Continuous-batching serving as a deployable artifact.

export_serving.py freezes the WHOLE-BATCH serving graph; this module freezes
the continuous-batching slot pool (serving_continuous.py) the same way: the
three device functions — admission encode, slot scatter, decode tick — are
serialized to StableHLO via ``jax.export``, next to the weights, the initial
slot state, and metadata. A serving host runs the pool with jax + numpy +
the pure-python scheduler loop (run_slot_scheduler — no model code, no
framework): state is an opaque LIST of arrays threaded between the frozen
graphs; the host only ever indexes the three bookkeeping leaves (active /
steps / toks) named in the metadata.

Artifact layout:
    encode_fn.bin   encode(weight_leaves, feats (A, ...), chunk_idx)
                    -> new-slot-state leaves (A rows)
    admit_fn.bin    admit(state_leaves, new_leaves, ids (A,), valid (A,))
                    -> state leaves
    step_fn.bin     step(weight_leaves, state_leaves) -> state leaves
                    (step_chunk greedy tokens for all R slots)
    weights.npz     flattened weights, ordinal keys (w00000, ...)
    state0.npz      the empty slot pool (s00000, ...)
    meta.json       pool geometry, bookkeeping leaf indices, dtypes, ids

RationaleNet's per-admission Gumbel key is reproduced inside the frozen
encode graph (fold_in(PRNGKey(seed), chunk_idx) with the chunk counter as a
call argument), so a live pool and its artifact decode identically chunk for
chunk.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

from vcr_tpu.export_serving import FORMAT_VERSION, _load_leaves, _save_leaves
from vcr_tpu.serving_continuous import ContinuousCaptioner, run_slot_scheduler

ENCODE_FILE = "encode_fn.bin"
ADMIT_FILE = "admit_fn.bin"
STEP_FILE = "step_fn.bin"
WEIGHTS_FILE = "weights.npz"
STATE_FILE = "state0.npz"
META_FILE = "meta.json"

_BOOKKEEPING = ("active", "steps", "toks")


def _leaf_paths(tree) -> list:
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(kp) for kp, _ in flat]


def export_continuous(params, spec, out_dir: str, *,
                      slots: int = 64, admit_chunk: int = 8,
                      step_chunk: int = 4, beam_size: int = 1,
                      eos_id: Optional[int] = None, vocab=None,
                      seed: int = 0,
                      feat_item_shape: Optional[Sequence[int]] = None,
                      platforms: Optional[Sequence[str]] = None,
                      kv_cache: Optional[str] = None,
                      decode_weights: Optional[str] = None) -> str:
    """Freeze a continuous-batching slot pool for (params, spec) into
    ``out_dir``. Pool geometry (slots/admit_chunk/step_chunk) is baked into
    the graphs (fixed shapes are the design). ``feat_item_shape`` overrides
    the per-video feature shape (needed only for SpatialNet grids that don't
    match ``spec.grid_size``). Returns ``out_dir``."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if getattr(spec, "use_pallas", False):
        # same portability rule as export_serving.export_captioner
        spec = spec.with_(use_pallas=False)
    cc = ContinuousCaptioner(params, spec, slots=slots,
                             admit_chunk=admit_chunk, step_chunk=step_chunk,
                             beam_size=beam_size, eos_id=eos_id, vocab=vocab,
                             kv_cache=kv_cache,
                             decode_weights=decode_weights,
                             rng=jax.random.PRNGKey(seed))
    step_impl = cc._step_n if beam_size == 1 else cc._step_n_beam

    if feat_item_shape is not None:
        item_shape = tuple(feat_item_shape)
    else:
        from vcr_tpu.export_serving import default_input_shape

        item_shape = default_input_shape(spec, "none")

    # The artifact serializes the pool's TICK tree (cc._step_params): under
    # decode_weights="int8" it carries the W8 codes (GRU families: augmented
    # next to the f32 originals, so the encode graph below still reads the
    # original names; transformer: decoder denses replaced, encoder intact).
    step_params = getattr(cc, "_step_params", cc.params)
    p_leaves, p_tree = jax.tree_util.tree_flatten(step_params)
    s_leaves, s_tree = jax.tree_util.tree_flatten(cc.state)
    s_paths = _leaf_paths(cc.state)
    book_idx = {}
    for name in _BOOKKEEPING:
        key = f"['{name}']"
        assert key in s_paths, (key, s_paths)
        book_idx[name] = s_paths.index(key)

    key0 = jax.random.PRNGKey(seed)
    feats_sds = jax.ShapeDtypeStruct((admit_chunk, *item_shape), jnp.float32)
    p_sds = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in p_leaves]
    s_sds = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in s_leaves]
    idx_sds = jax.ShapeDtypeStruct((), jnp.int32)
    ids_sds = jax.ShapeDtypeStruct((admit_chunk,), jnp.int32)
    valid_sds = jax.ShapeDtypeStruct((admit_chunk,), jnp.bool_)

    # new-slot-state structure (what encode returns, what admit consumes)
    nd_struct = jax.eval_shape(cc._encode_chunk, step_params, feats_sds, key0)
    nd_leaves_s, nd_tree = jax.tree_util.tree_flatten(nd_struct)
    nd_sds = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in nd_leaves_s]

    def encode_fn(weight_leaves, feats, chunk_idx):
        p = jax.tree_util.tree_unflatten(p_tree, weight_leaves)
        nd = cc._encode_chunk(p, feats, jax.random.fold_in(key0, chunk_idx))
        return jax.tree_util.tree_leaves(nd)

    def admit_fn(state_leaves, new_leaves, ids, valid):
        st = jax.tree_util.tree_unflatten(s_tree, state_leaves)
        nd = jax.tree_util.tree_unflatten(nd_tree, new_leaves)
        return jax.tree_util.tree_leaves(cc._admit(st, nd, ids, valid))

    def step_fn(weight_leaves, state_leaves):
        p = jax.tree_util.tree_unflatten(p_tree, weight_leaves)
        st = jax.tree_util.tree_unflatten(s_tree, state_leaves)
        return jax.tree_util.tree_leaves(step_impl(p, st))

    plat = tuple(platforms) if platforms else None
    # state leaves are DONATED (baked into the artifact as input-output
    # aliasing): without it every replayed tick pays a full state copy of
    # HBM traffic — the live pool's ContinuousCaptioner donates the same way
    exp_encode = jexport.export(jax.jit(encode_fn), platforms=plat)(
        p_sds, feats_sds, idx_sds)
    exp_admit = jexport.export(jax.jit(admit_fn, donate_argnums=(0,)),
                               platforms=plat)(
        s_sds, nd_sds, ids_sds, valid_sds)
    exp_step = jexport.export(jax.jit(step_fn, donate_argnums=(1,)),
                              platforms=plat)(p_sds, s_sds)

    os.makedirs(out_dir, exist_ok=True)
    for fname, exp in ((ENCODE_FILE, exp_encode), (ADMIT_FILE, exp_admit),
                       (STEP_FILE, exp_step)):
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
    _save_leaves(os.path.join(out_dir, WEIGHTS_FILE), p_leaves)
    _save_leaves(os.path.join(out_dir, STATE_FILE), s_leaves)
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "continuous",
        "spec": dataclasses.asdict(spec),
        "feat_item_shape": [int(d) for d in item_shape],
        "slots": int(slots),
        "admit_chunk": int(admit_chunk),
        "step_chunk": int(cc.step_chunk),
        "beam_size": int(beam_size),
        "eos_id": int(cc.eos_id),
        "sos_id": int(spec.sos_id),
        "max_len": int(spec.max_len),
        "seed": int(seed),
        "bookkeeping_leaf_indices": book_idx,
        "weight_leaf_dtypes": [str(np.dtype(l.dtype)) for l in p_leaves],
        "state_leaf_dtypes": [str(np.dtype(l.dtype)) for l in s_leaves],
        "platforms": list(exp_step.platforms),
        "jax_version": jax.__version__,
    }
    if vocab is not None:
        # embed the detokenizer: id -> word, so the serving host can emit
        # caption STRINGS with no vocab/GloVe files (meta is the only source)
        meta["id_to_word"] = [vocab.get_word(i)
                              for i in range(vocab.vocab_size)]
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


class _MetaVocab:
    """Detokenizer rebuilt from meta['id_to_word'] — mirrors
    Vocab.get_sent_from_index (stop at <eos>) without any vocab files."""

    def __init__(self, words):
        self._words = words

    def get_sent_from_index(self, indexes) -> str:
        out = []
        for i in indexes:
            w = self._words[int(i)]
            if w == "<eos>":
                break
            out.append(w)
        return " ".join(out)


class ContinuousArtifact:
    """A loaded continuous-serving artifact: the same scheduler-ops protocol
    as ContinuousCaptioner (run_slot_scheduler drives it; CaptionServer can
    front it), with every device function a frozen StableHLO graph. No model
    code runs on the serving host."""

    def __init__(self, artifact_dir: str):
        import jax
        from jax import export as jexport

        with open(os.path.join(artifact_dir, META_FILE)) as f:
            self.meta = json.load(f)
        if self.meta.get("kind") != "continuous":
            raise ValueError(
                "not a continuous-serving artifact (use "
                "export_serving.load_artifact)")
        if self.meta.get("format_version") != FORMAT_VERSION:
            # a future-format artifact loading silently would index the
            # wrong bookkeeping leaves and serve garbage — fail loudly
            raise ValueError(
                f"artifact format_version {self.meta.get('format_version')} "
                f"(this loader understands {FORMAT_VERSION})")

        def _load(fname):
            with open(os.path.join(artifact_dir, fname), "rb") as f:
                return jexport.deserialize(f.read())

        self._encode = _load(ENCODE_FILE)
        self._admit = _load(ADMIT_FILE)
        self._step = _load(STEP_FILE)
        self._weights = [
            jax.device_put(l) for l in _load_leaves(
                os.path.join(artifact_dir, WEIGHTS_FILE),
                self.meta["weight_leaf_dtypes"])]
        self._state = [
            jax.device_put(l) for l in _load_leaves(
                os.path.join(artifact_dir, STATE_FILE),
                self.meta["state_leaf_dtypes"])]
        self._book = self.meta["bookkeeping_leaf_indices"]
        self.slots = self.meta["slots"]
        self.admit_chunk = self.meta["admit_chunk"]
        self.step_chunk = self.meta["step_chunk"]
        self.beam_size = self.meta.get("beam_size", 1)
        self.eos_id = self.meta["eos_id"]
        self.stats = {"ticks": 0, "admit_chunks": 0, "served": 0,
                      "useful_steps": 0, "slot_steps": 0}
        self.in_flight = 0
        self._chunk_idx = 0
        self.vocab = (_MetaVocab(self.meta["id_to_word"])
                      if "id_to_word" in self.meta else None)

    # ----------------------------------------------- scheduler ops protocol

    def check_feat_shape(self, shape):
        """Same front-door validation as ContinuousCaptioner.check_feat_shape
        (a wrong-shape request must 400 at the API layer, not crash the
        scheduler inside a StableHLO call) — exact here, since the encode
        graph's item shape is baked in at export and recorded in the meta."""
        want = self.meta.get("feat_item_shape")
        if want is None:  # older artifact: fall back to the spec-derived shape
            s = self.meta["spec"]
            want = ([s["num_frames"], s["vid_feat_size"], s["grid_size"],
                     s["grid_size"]] if s["arch"] == "spatial"
                    else [s["num_frames"], s["vid_feat_size"]])
        if list(shape) == list(want):
            return None
        return f"expected {tuple(want)} features, got {tuple(shape)}"

    def encode_admit(self, feats, ids, valid) -> None:
        import jax.numpy as jnp

        self._chunk_idx += 1
        new = self._encode.call(self._weights, jnp.asarray(feats, jnp.float32),
                                jnp.int32(self._chunk_idx))
        self._state = list(self._admit.call(self._state, list(new),
                                            jnp.asarray(ids, jnp.int32),
                                            jnp.asarray(valid, jnp.bool_)))

    def tick(self) -> None:
        self._state = list(self._step.call(self._weights, self._state))

    def poll_active(self) -> np.ndarray:
        return np.asarray(self._state[self._book["active"]])

    def read_tokens(self):
        return (np.asarray(self._state[self._book["toks"]]),
                np.asarray(self._state[self._book["steps"]]))

    # --------------------------------------------------------------- driving

    def caption_stream(self, requests, poll_cancelled=None):
        # no release_slots graph in the artifact: in-flight cancels are
        # skipped by the scheduler; queued cancels still drop pre-admission
        return run_slot_scheduler(self, requests,
                                  poll_cancelled=poll_cancelled)

    def caption_all(self, feats_by_key: Dict) -> Dict:
        return dict(self.caption_stream(feats_by_key.items()))


def load_continuous(artifact_dir: str) -> ContinuousArtifact:
    return ContinuousArtifact(artifact_dir)
