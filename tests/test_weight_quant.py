"""int8 decode-WEIGHT quantization (ops/wquant.py): helper math + the opt-in
``decode_weights="int8"`` serving mode on the transformer steppers.

Like the KV-cache modes, the serving claim is NOT bit-identity but a bounded
envelope: per-output-channel symmetric int8 keeps relative error <= 1/254
per weight, the fold ``(x @ Wq) * s`` is mathematically exact vs
dequantize-then-matmul (the scale is constant over the contraction axis),
and greedy token agreement is high. What IS bitwise-tested: pre-quantized
params (quantize_decoder_params — the pool's init-time form) produce the
identical program to in-stepper quantization, and the slot pool stays
token-exact vs the batch fast decode WITHIN the mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.ops import wquant


@pytest.fixture
def rng():
    return np.random.default_rng(13)


def test_roundtrip_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((24, 17)).astype(np.float32))
    q = wquant.quantize_dense({"w": w, "b": jnp.zeros((17,))})
    assert np.asarray(q["wq"]).dtype == np.int8
    back = wquant.dequantize_dense(q)["w"]
    amax = np.max(np.abs(np.asarray(w)), axis=0, keepdims=True)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # round-to-nearest: |err| <= scale/2 = amax/254 per column
    assert (err <= amax / 254.0 + 1e-7).all()


def test_stacked_matches_sliced(rng):
    """Quantizing the stacked (n_layers, in, out) tree == quantizing each
    layer slice (bitwise) — the reduction runs over the contraction axis."""
    w = jnp.asarray(rng.standard_normal((3, 10, 6)).astype(np.float32))
    stacked = wquant.quantize_dense({"w": w})
    for i in range(3):
        sl = wquant.quantize_dense({"w": w[i]})
        np.testing.assert_array_equal(np.asarray(stacked["wq"][i]),
                                      np.asarray(sl["wq"]))
        np.testing.assert_array_equal(np.asarray(stacked["ws"][i]),
                                      np.asarray(sl["ws"]))


def test_fold_matches_dequant_matmul(rng):
    """(x @ Wq) * s + b tracks x @ dequant(Wq, s) + b to fp32 tolerance —
    the per-column scale commutes with the contraction exactly; only fp
    reassociation differs."""
    x = jnp.asarray(rng.standard_normal((5, 24)).astype(np.float32))
    p = {"w": jnp.asarray(rng.standard_normal((24, 17)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal((17,)).astype(np.float32))}
    q = wquant.quantize_dense(p)
    from vcr_tpu.nn.layers import dense

    want = dense(wquant.dequantize_dense(q), x, jnp.float32)
    got = wquant.dense_q(q, x, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_zero_column_is_exact(rng):
    w = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32)
                    ).at[:, 2].set(0.0)
    q = wquant.quantize_dense({"w": w})
    back = np.asarray(wquant.dequantize_dense(q)["w"])
    np.testing.assert_array_equal(back[:, 2], 0.0)
    assert np.isfinite(back).all()


# ----------------------------------------------- stepper / pool integration


def _spec(tiny_vocab, **kw):
    from vcr_tpu.models import base

    return base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=12,
        max_len=8, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2, **kw)


def _setup(tiny_vocab, n=3, bt=1, lineage=False, dw="int8", kv="bf16",
           seed=5, prequant=False):
    import vcr_tpu.models.transformer as trm

    spec = _spec(tiny_vocab)
    params = trm.init_params(jax.random.PRNGKey(seed), spec,
                             tiny_vocab.vectors)
    if prequant:
        params = trm.quantize_decoder_params(params)
    feats = jnp.asarray(np.random.default_rng(11).standard_normal((n, 4, 12)),
                        jnp.float32)
    eo = trm.encode(params, spec, feats, trm.create_masks_inp(feats),
                    jax.random.PRNGKey(0), train=False)
    step, init_self, cross = trm.make_slot_stepper(
        params, spec, beam_tile=bt, lineage=lineage, kv_cache=kv,
        decode_weights=dw)
    rows = n * bt
    st = {**init_self(rows),
          **cross(jnp.repeat(eo, bt, axis=0) if bt > 1 else eo)}
    return spec, step, st, rows


def test_slot_stepper_logit_envelope(tiny_vocab):
    """int8-weight logits track the fp32-weight path within a small envelope
    and (fp32 compute, comfortable random-logit gaps) emit the same greedy
    tokens for most steps."""
    spec, step_q, st_q, rows = _setup(tiny_vocab, dw="int8")
    _, step_f, st_f, _ = _setup(tiny_vocab, dw="bf16")
    w = jnp.full((rows,), spec.sos_id, jnp.int32)
    max_gap, agree, steps = 0.0, 0, 6
    for i in range(steps):
        iv = jnp.full((rows,), i, jnp.int32)
        st_q, lq = step_q(st_q, w, iv)
        st_f, lf = step_f(st_f, w, iv)   # same (teacher-forced) word stream
        max_gap = max(max_gap, float(jnp.max(jnp.abs(
            lq.astype(jnp.float32) - lf.astype(jnp.float32)))))
        agree += int((jnp.argmax(lq, -1) == jnp.argmax(lf, -1)).sum())
        w = jnp.argmax(lf, -1).astype(jnp.int32)
    assert max_gap < 0.35, max_gap
    assert agree >= 0.8 * rows * steps


def test_prequantized_bitwise_identical(tiny_vocab):
    """quantize_decoder_params (the pool's one-time init form) and
    in-stepper quantization produce bit-identical logits and state: the
    stepper detects the "wq" leaves and the quantization math is the same
    deterministic eager computation either way."""
    spec, step_a, st_a, rows = _setup(tiny_vocab, dw="int8", prequant=False)
    _, step_b, st_b, _ = _setup(tiny_vocab, dw="int8", prequant=True)
    w = jnp.full((rows,), spec.sos_id, jnp.int32)
    for i in range(4):
        iv = jnp.full((rows,), i, jnp.int32)
        st_a, la = step_a(st_a, w, iv)
        st_b, lb = step_b(st_b, w, iv)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        w = jnp.argmax(la, -1).astype(jnp.int32)
    for a, b in zip(jax.tree_util.tree_leaves(st_a),
                    jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_env_var_matches_kwarg(tiny_vocab, monkeypatch):
    """VCR_DECODE_WEIGHTS=int8 defaults the mode exactly like the kwarg."""
    monkeypatch.setenv("VCR_DECODE_WEIGHTS", "int8")
    spec, step_e, st_e, rows = _setup(tiny_vocab, dw=None)
    monkeypatch.delenv("VCR_DECODE_WEIGHTS")
    _, step_k, st_k, _ = _setup(tiny_vocab, dw="int8")
    w = jnp.full((rows,), spec.sos_id, jnp.int32)
    iv = jnp.zeros((rows,), jnp.int32)
    _, le = step_e(st_e, w, iv)
    _, lk = step_k(st_k, w, iv)
    np.testing.assert_array_equal(np.asarray(le), np.asarray(lk))


@pytest.mark.parametrize("kv", ["int8", "int4"])
def test_composes_with_kv_cache(tiny_vocab, kv):
    """decode_weights='int8' + quantized KV caches run together; the joint
    envelope stays bounded (errors add, they don't interact)."""
    spec, step_q, st_q, rows = _setup(tiny_vocab, dw="int8", kv=kv)
    _, step_f, st_f, _ = _setup(tiny_vocab, dw="bf16", kv="bf16")
    w = jnp.full((rows,), spec.sos_id, jnp.int32)
    for i in range(4):
        iv = jnp.full((rows,), i, jnp.int32)
        st_q, lq = step_q(st_q, w, iv)
        st_f, lf = step_f(st_f, w, iv)
        gap = float(jnp.max(jnp.abs(lq.astype(jnp.float32)
                                    - lf.astype(jnp.float32))))
        assert gap < (0.7 if kv == "int8" else 3.0), (kv, i, gap)
        w = jnp.argmax(lf, -1).astype(jnp.int32)


def test_batch_fast_decode(tiny_vocab):
    """The BATCH fast paths share the option: decode_greedy_fast and both
    beam variants run with decode_weights='int8' and mostly agree with the
    fp32-weight tokens."""
    import vcr_tpu.models.transformer as trm
    from vcr_tpu.decode import transformer_beam_decode_fast

    spec = _spec(tiny_vocab)
    params = trm.init_params(jax.random.PRNGKey(4), spec, tiny_vocab.vectors)
    feats = jnp.asarray(np.random.default_rng(12).standard_normal((3, 4, 12)),
                        jnp.float32)
    eo = trm.encode(params, spec, feats, trm.create_masks_inp(feats),
                    jax.random.PRNGKey(0), train=False)
    t_f = np.asarray(trm.decode_greedy_fast(params, spec, eo))
    t_q = np.asarray(trm.decode_greedy_fast(params, spec, eo,
                                            decode_weights="int8"))
    assert t_q.shape == t_f.shape and t_q.dtype == t_f.dtype
    assert float((t_q == t_f).mean()) >= 0.8
    for lineage in (False, True):
        toks, scores = transformer_beam_decode_fast(
            params, spec, feats, beam_size=2, eos_id=tiny_vocab.eos_id,
            lineage=lineage, decode_weights="int8")
        assert np.asarray(toks).shape == (3, 2, spec.max_len)
        assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.parametrize("beam", [1, 2])
def test_pool_token_exact_vs_batch_within_mode(tiny_vocab, rng, beam):
    """The slot-vs-batch parity contract holds WITHIN the int8-weight mode:
    a ContinuousCaptioner(decode_weights='int8') pool emits token-identical
    captions to the batch fast decode run with the same mode (fp32 compute,
    CPU). The pool pre-quantizes at init; the batch path quantizes in-trace
    — test_prequantized_bitwise_identical pins that those are bit-equal."""
    import vcr_tpu.models.transformer as trm
    from vcr_tpu.decode import transformer_beam_decode_fast
    from vcr_tpu.serving_continuous import ContinuousCaptioner

    spec = _spec(tiny_vocab)
    params = trm.init_params(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    feats = rng.standard_normal((5, 4, 12)).astype(np.float32)
    cap = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                              eos_id=tiny_vocab.eos_id, beam_size=beam,
                              decode_weights="int8")
    got = cap.caption_all({i: feats[i] for i in range(5)})

    if beam == 1:
        eo = trm.encode(params, spec, jnp.asarray(feats),
                        trm.create_masks_inp(jnp.asarray(feats)),
                        jax.random.PRNGKey(0), train=False)
        ref = np.asarray(trm.decode_greedy_fast(params, spec, eo,
                                                decode_weights="int8"))
    else:
        toks, _ = transformer_beam_decode_fast(
            params, spec, jnp.asarray(feats), beam_size=beam,
            eos_id=tiny_vocab.eos_id, lineage=True, decode_weights="int8")
        ref = np.asarray(toks[:, 0])

    for i in range(5):
        row = ref[i]
        stop = np.where(row == tiny_vocab.eos_id)[0]
        want = row[:stop[0] + 1] if len(stop) else row
        np.testing.assert_array_equal(np.asarray(got[i]), want)


def test_invalid_mode_rejects(tiny_vocab):
    import vcr_tpu.models.base as mbase
    from vcr_tpu.serving_continuous import ContinuousCaptioner

    s2 = mbase.ModelSpec(
        arch="s2vt", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=12,
        max_len=8, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32")
    p2 = mbase.build_model("s2vt")[0](jax.random.PRNGKey(0), s2,
                                      tiny_vocab.vectors)
    with pytest.raises(ValueError, match="decode_weights"):
        ContinuousCaptioner(p2, s2, slots=4, admit_chunk=2,
                            eos_id=tiny_vocab.eos_id, decode_weights="int3")


# ----------------------------------------------------- GRU-family W8 mode


def test_gru_fold_matches_dequant(rng):
    """gru_x_gates / gru_h_gates through the int8 codes track the f32 gate
    pre-activations computed from the dequantized weights (exact fold, fp
    reassociation only)."""
    from vcr_tpu.nn.layers import vdot

    p = {"w_ih": jnp.asarray(rng.standard_normal((20, 24)).astype(np.float32)),
         "w_hh": jnp.asarray(rng.standard_normal((8, 24)).astype(np.float32)),
         "b_ih": jnp.asarray(rng.standard_normal((24,)).astype(np.float32)),
         "b_hh": jnp.asarray(rng.standard_normal((24,)).astype(np.float32))}
    q = wquant.augment_gru(p)
    assert wquant.augment_gru(q) is q          # idempotent
    x = jnp.asarray(rng.standard_normal((5, 20)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    deq_ih = wquant.dequantize_dense({"wq": q["wq_ih"], "ws": q["ws_ih"]})["w"]
    deq_hh = wquant.dequantize_dense({"wq": q["wq_hh"], "ws": q["ws_hh"]})["w"]
    np.testing.assert_allclose(
        np.asarray(wquant.gru_x_gates(q, x, jnp.float32)),
        np.asarray(vdot(x, deq_ih, jnp.float32) + p["b_ih"]),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(wquant.gru_h_gates(q, h, jnp.float32)),
        np.asarray(vdot(h, deq_hh, jnp.float32) + p["b_hh"]),
        rtol=1e-6, atol=1e-6)


def _gru_spec(tiny_vocab, arch, **kw):
    from vcr_tpu.models import base

    vf = kw.pop("vid_feat_size", 12)
    return base.ModelSpec(
        arch=arch, vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=vf,
        max_len=8, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", **kw)


@pytest.mark.parametrize("arch,kw", [
    ("s2vt", {}),
    ("s2vt-att", {}),
    ("rationale", {"base_arch": "s2vt", "tau": 1.0}),
    ("spatial", {"base_arch": "s2vt-att", "grid_size": 3,
                 "vid_feat_size": 6}),
])
def test_gru_pool_token_exact_vs_batch_within_mode(tiny_vocab, rng, arch, kw):
    """The slot-vs-batch parity contract holds WITHIN the GRU W8 mode for
    all four GRU-decode families: a decode_weights='int8' pool emits
    token-identical captions to decode_tokens(beam-1, decode_weights='int8')
    (fp32 compute, CPU; rationale under zero-noise Gumbel — the pool and
    batch rng streams differ)."""
    import vcr_tpu.models.base as mbase
    from vcr_tpu.decode import decode_tokens
    from vcr_tpu.nn import gumbel
    from vcr_tpu.serving_continuous import ContinuousCaptioner

    spec = _gru_spec(tiny_vocab, arch, **kw)
    params = mbase.build_model(arch)[0](jax.random.PRNGKey(1), spec,
                                        tiny_vocab.vectors)
    shape = ((5, 4, spec.vid_feat_size, 3, 3) if arch == "spatial"
             else (5, 4, spec.vid_feat_size))
    feats = rng.standard_normal(shape).astype(np.float32)
    old = gumbel.ZERO_NOISE
    gumbel.ZERO_NOISE = True
    try:
        toks, _ = decode_tokens(params, spec, jnp.asarray(feats),
                                tiny_vocab.eos_id, beam_size=1,
                                decode_weights="int8")
        rows = np.asarray(toks)[:, 0]
        cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                                 eos_id=tiny_vocab.eos_id,
                                 decode_weights="int8")
        got = cc.caption_all({i: feats[i] for i in range(5)})
    finally:
        gumbel.ZERO_NOISE = old
    for i in range(5):
        row = rows[i]
        hits = np.nonzero(row == tiny_vocab.eos_id)[0]
        want = row[: hits[0] + 1] if len(hits) else row
        np.testing.assert_array_equal(np.asarray(got[i]), want)


def test_gru_w8_tracks_bf16_weights(tiny_vocab, rng):
    """W8 s2vt pool logit trajectory tracks the exact pool: compare emitted
    captions — near-identical on a confident random model (and the envelope
    is implicitly bounded by the within-mode exactness + fold oracle)."""
    import vcr_tpu.models.base as mbase
    from vcr_tpu.serving_continuous import ContinuousCaptioner

    spec = _gru_spec(tiny_vocab, "s2vt")
    params = mbase.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                          tiny_vocab.vectors)
    feats = rng.standard_normal((6, 4, 12)).astype(np.float32)
    reqs = {i: feats[i] for i in range(6)}
    got_f = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                                eos_id=tiny_vocab.eos_id).caption_all(reqs)
    got_q = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                                eos_id=tiny_vocab.eos_id,
                                decode_weights="int8").caption_all(reqs)
    same = sum(np.array_equal(got_f[i], got_q[i]) for i in range(6))
    assert same >= 4, {i: (np.asarray(got_f[i]), np.asarray(got_q[i]))
                       for i in range(6)}


def test_gru_w8_frozen_artifact(tiny_vocab, rng, tmp_path):
    """A decode_weights='int8' GRU continuous artifact replays
    token-identically to the live W8 pool (the augmented tree serves both
    the encode and step graphs)."""
    import vcr_tpu.models.base as mbase
    from vcr_tpu import export_continuous as excont
    from vcr_tpu.serving_continuous import ContinuousCaptioner

    spec = _gru_spec(tiny_vocab, "s2vt-att")
    params = mbase.build_model("s2vt-att")[0](jax.random.PRNGKey(5), spec,
                                              tiny_vocab.vectors)
    feats = rng.standard_normal((5, 4, 12)).astype(np.float32)
    reqs = {i: feats[i] for i in range(5)}
    live = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                               eos_id=tiny_vocab.eos_id,
                               decode_weights="int8").caption_all(reqs)
    out = str(tmp_path / "art")
    excont.export_continuous(params, spec, out, slots=3, admit_chunk=2,
                             eos_id=tiny_vocab.eos_id,
                             decode_weights="int8", platforms=("cpu",))
    art = excont.load_continuous(out)
    got = art.caption_all(reqs)
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(got[i]),
                                      np.asarray(live[i]))


def test_gru_w8_under_dp_mesh(tiny_vocab, rng):
    """decode_weights='int8' composes with a dp-sharded GRU pool: the
    augmented step tree rides the mesh (replicated weights, dp-sharded
    rows) and stays token-identical to the unsharded W8 pool."""
    import vcr_tpu.models.base as mbase
    from vcr_tpu.parallel import make_mesh
    from vcr_tpu.serving_continuous import ContinuousCaptioner

    spec = _gru_spec(tiny_vocab, "s2vt")
    params = mbase.build_model("s2vt")[0](jax.random.PRNGKey(6), spec,
                                          tiny_vocab.vectors)
    feats = rng.standard_normal((5, 4, 12)).astype(np.float32)
    reqs = {i: feats[i] for i in range(5)}
    want = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                               eos_id=tiny_vocab.eos_id,
                               decode_weights="int8").caption_all(reqs)
    got = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                              eos_id=tiny_vocab.eos_id, mesh=make_mesh(2, 1),
                              decode_weights="int8").caption_all(reqs)
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(got[i]),
                                      np.asarray(want[i]))
