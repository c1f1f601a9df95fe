"""int8 KV-cache quantization: helper math + (once integrated) the opt-in
quantized slot-decode path.

The serving claim is NOT bit-identity (impossible under quantization) but a
bounded envelope: per-vector symmetric int8 keeps relative error <= 1/127
per K/V vector, attention logits within a small envelope of the bf16-cache
path, and greedy token agreement high on realistic-scale random models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.ops import kvquant


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_roundtrip_error_bound(rng, mode):
    qmax, qdtype = kvquant.mode_params(mode)
    v = jnp.asarray(rng.standard_normal((5, 4, 9, 64)).astype(np.float32))
    q, s = kvquant.quantize(v, qmax=qmax, qdtype=qdtype)
    assert np.asarray(q.astype(jnp.int8)).dtype == np.int8
    back = kvquant.dequantize(q, s)
    amax = np.max(np.abs(np.asarray(v)), axis=-1, keepdims=True)
    # round-to-nearest: |err| <= scale/2 = amax/(2*qmax) elementwise
    err = np.abs(np.asarray(back) - np.asarray(v))
    assert (err <= amax / (2 * qmax) + 1e-7).all()


def test_zero_vector_is_exact(rng):
    v = jnp.zeros((3, 8))
    q, s = kvquant.quantize(v)
    assert np.asarray(q).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(kvquant.dequantize(q, s)), 0.0)
    # mixed: one zero row among real rows must not NaN/corrupt others
    v2 = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32)
                     ).at[1].set(0.0)
    q2, s2 = kvquant.quantize(v2)
    back = np.asarray(kvquant.dequantize(q2, s2))
    np.testing.assert_array_equal(back[1], 0.0)
    assert np.isfinite(back).all()


def test_fold_k_matches_dequant_dot(rng):
    """(q·K_q)·s == q·dequant(K) exactly in fp32 (scale is a scalar per
    position — it commutes with the contraction over d)."""
    q = jnp.asarray(rng.standard_normal((2, 3, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 3, 10, 16)).astype(np.float32))
    kq, ks = kvquant.quantize(k)                      # (2,3,10,16), (2,3,10,1)
    want = jnp.einsum("bhd,bhld->bhl", q, kvquant.dequantize(kq, ks))
    got = kvquant.fold_k(
        jnp.einsum("bhd,bhld->bhl", q, kq.astype(jnp.float32)), ks[..., 0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fold_v_matches_dequant_dot(rng):
    w = jnp.asarray(rng.standard_normal((2, 3, 10)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 3, 10, 16)).astype(np.float32))
    vq, vs = kvquant.quantize(v)
    want = jnp.einsum("bhl,bhld->bhd", w, kvquant.dequantize(vq, vs))
    got = jnp.einsum("bhl,bhld->bhd", kvquant.fold_v(w, vs[..., 0]),
                     vq.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


# ----------------------------------------------- slot-stepper integration


def _spec(tiny_vocab, **kw):
    from vcr_tpu.models import base

    return base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=12,
        max_len=8, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2, **kw)


def _setup(tiny_vocab, rng, n=3, bt=1, lineage=False, kv="int8", seed=5):
    import vcr_tpu.models.transformer as trm

    del rng  # repeated calls must see IDENTICAL data: own deterministic gen
    spec = _spec(tiny_vocab)
    params = trm.init_params(jax.random.PRNGKey(seed), spec,
                             tiny_vocab.vectors)
    feats = jnp.asarray(np.random.default_rng(11).standard_normal((n, 4, 12)),
                        jnp.float32)
    eo = trm.encode(params, spec, feats, trm.create_masks_inp(feats),
                    jax.random.PRNGKey(0), train=False)
    step, init_self, cross = trm.make_slot_stepper(
        params, spec, beam_tile=bt, lineage=lineage, kv_cache=kv)
    rows = n * bt
    st = {**init_self(rows),
          **cross(jnp.repeat(eo, bt, axis=0) if bt > 1 else eo)}
    return spec, step, st, rows


@pytest.mark.parametrize("kv,bound", [("int8", 0.35), ("int4", 2.5)])
def test_int8_stepper_logit_envelope(tiny_vocab, rng, kv, bound):
    """Quantized logits track the bf16/fp32 cache path within a per-mode
    envelope (int4's coarser codebook earns a looser one) and (at fp32
    compute on CPU, comfortable score gaps) emit the same greedy tokens
    for most steps."""
    spec, step_q, st_q, rows = _setup(tiny_vocab, rng, kv=kv)
    _, step_f, st_f, _ = _setup(tiny_vocab, rng, kv="bf16")
    w = jnp.full((rows,), spec.sos_id, jnp.int32)
    max_gap = 0.0
    for i in range(6):
        iv = jnp.full((rows,), i, jnp.int32)
        st_q, lq = step_q(st_q, w, iv)
        st_f, lf = step_f(st_f, w, iv)   # same (teacher-forced) word stream
        max_gap = max(max_gap, float(jnp.max(jnp.abs(
            lq.astype(jnp.float32) - lf.astype(jnp.float32)))))
        w = jnp.argmax(lf, -1).astype(jnp.int32)
    assert max_gap < bound, (kv, max_gap)


@pytest.mark.parametrize("lineage", [False, True])
def test_int8_masked_scatter_bitwise(tiny_vocab, rng, lineage, monkeypatch):
    """The cache-write mode is still value-free in int8: codes and scales
    land identically whether scattered or mask-rewritten."""
    outs = []
    for mode in ("scatter", "masked"):
        monkeypatch.setenv("VCR_SLOT_WRITE", mode)
        bt = 2 if lineage else 1
        spec, step, st, rows = _setup(tiny_vocab, rng, bt=bt, lineage=lineage)
        w = jnp.full((rows,), spec.sos_id, jnp.int32)
        logits = []
        for i in range(4):
            st, lg = step(st, w, jnp.full((rows,), i, jnp.int32))
            w = jnp.argmax(lg, -1).astype(jnp.int32)
            logits.append(np.asarray(lg))
        outs.append((np.stack(logits), st))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("kv", ["int8", "int4"])
def test_int8_lineage_bookkeeping_bitexact(tiny_vocab, rng, kv):
    """The ancestry-vs-physical-reorder contract survives quantization:
    codes and their scales ride the same true gathers, so tracking beams by
    ancestry is bit-identical to physically permuting the quantized caches."""
    k = 2
    spec, step, st0, rows = _setup(tiny_vocab, rng, n=2, bt=k, lineage=True,
                                   kv=kv)
    perms = [np.array([1, 0, 0, 1]), np.array([0, 0, 1, 1]),
             np.array([1, 1, 0, 0])]
    group_base = (np.arange(rows) // k) * k
    local = jnp.asarray((np.arange(rows) % k).astype(np.int32))
    anc_identity = jnp.tile(local[:, None], (1, spec.max_len))

    def roll(mode):
        st = {kk: v for kk, v in st0.items()}
        w = jnp.full((rows,), spec.sos_id, jnp.int32)
        logits = []
        for i, perm in enumerate(perms):
            st, lg = step(st, w, jnp.full((rows,), i, jnp.int32))
            logits.append(np.asarray(lg))
            w = jnp.argmax(lg, -1).astype(jnp.int32)
            flat_src = jnp.asarray(group_base + perm, jnp.int32)
            if mode == "ancestry":
                st = dict(st, anc=st["anc"][flat_src])
            else:
                st = {kk: jax.tree_util.tree_map(lambda x: x[flat_src], v)
                      for kk, v in st.items() if kk != "anc"}
                st["anc"] = anc_identity
            w = w[flat_src]
        return logits

    for a, b in zip(roll("ancestry"), roll("physical")):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("lineage", [False, True])
@pytest.mark.parametrize("kv,atol", [("int8", 0.05), ("int4", 0.8)])
def test_int8_matches_dequant_oracle(tiny_vocab, rng, lineage, kv, atol):
    """Decisive fold-correctness proof: run the int8 stepper a few steps,
    then DEQUANTIZE its cache state (codes x scales) into plain caches and
    feed those to the fp32-cache stepper — one more step on each must agree
    to fp32 tolerance. A wrong scale alignment (e.g. a bad transpose in the
    lineage fold) would diverge grossly; the fold identities commute with
    the dots exactly (test_fold_k/v), so agreement is ~1e-5."""
    import vcr_tpu.models.transformer as trm

    bt = 2 if lineage else 1
    spec, step_q, st_q, rows = _setup(tiny_vocab, rng, bt=bt, lineage=lineage,
                                      kv=kv)
    _, step_f, st_f, _ = _setup(tiny_vocab, rng, bt=bt, lineage=lineage,
                                kv="bf16")
    w = jnp.full((rows,), spec.sos_id, jnp.int32)
    for i in range(3):
        st_q, lg = step_q(st_q, w, jnp.full((rows,), i, jnp.int32))
        w = jnp.argmax(lg, -1).astype(jnp.int32)

    # transplant the dequantized int8 state into the plain stepper's state
    st_mix = dict(st_f)
    for k, v in st_q.items():
        if k == "anc":
            st_mix[k] = v
        elif len(v) == 4:
            kq, ks, vq, vs = v
            st_mix[k] = (kvquant.dequantize(kq, ks[..., None],
                                            st_f[k][0].dtype),
                         kvquant.dequantize(vq, vs[..., None],
                                            st_f[k][1].dtype))
        else:
            st_mix[k] = v

    iv = jnp.full((rows,), 3, jnp.int32)
    _, lg_q = step_q(st_q, w, iv)
    _, lg_o = step_f(st_mix, w, iv)
    # the NEW token's K/V are quantized on the int8 side and exact on the
    # oracle side — that one vector's quantization error bounds the gap
    np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_o),
                               rtol=0, atol=atol)


def test_int8_batch_fast_decode(tiny_vocab, rng):
    """The BATCH fast paths share the option: decode_greedy_fast and
    transformer_beam_decode_fast run with kv_cache='int8' and emit
    well-formed tokens; the lineage/gather beam variants both accept it."""
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
                                            kv_cache="int8"))
    assert t_q.shape == t_f.shape and t_q.dtype == t_f.dtype
    # fp32 compute + comfortable random-logit gaps: most tokens agree
    agree = float((t_q == t_f).mean())
    assert agree >= 0.8, (agree, t_q, t_f)
    for lineage in (False, True):
        toks, scores = transformer_beam_decode_fast(
            params, spec, feats, beam_size=2, eos_id=tiny_vocab.eos_id,
            lineage=lineage, kv_cache="int8")
        assert np.asarray(toks).shape == (3, 2, spec.max_len)
        assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.parametrize("kv", ["int8", "int4"])
def test_int8_pool_end_to_end(tiny_vocab, rng, kv):
    """ContinuousCaptioner(kv_cache='int8'/'int4'): greedy and beam pools
    serve every request with well-formed tokens; GRU families reject the
    flag."""
    import vcr_tpu.models.base as mbase
    from vcr_tpu.serving_continuous import ContinuousCaptioner

    spec = _spec(tiny_vocab)
    params = mbase.build_model("transformer")[0](
        jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    feats = rng.standard_normal((5, 4, 12)).astype(np.float32)
    reqs = {i: feats[i] for i in range(5)}
    for beam in (1, 2):
        toks = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                                   eos_id=tiny_vocab.eos_id, beam_size=beam,
                                   kv_cache=kv).caption_all(reqs)
        assert set(toks) == set(reqs)
        for t in toks.values():
            t = np.asarray(t)
            assert t.ndim == 1 and len(t) <= spec.max_len
            # harvested rows stop AT the first <eos> (it may be the final
            # token); none may appear mid-caption
            assert (t[:-1] != tiny_vocab.eos_id).all()

    s2 = mbase.ModelSpec(
        arch="s2vt", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=12,
        max_len=8, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32")
    p2 = mbase.build_model("s2vt")[0](jax.random.PRNGKey(0), s2,
                                      tiny_vocab.vectors)
    with pytest.raises(ValueError, match="int8"):
        ContinuousCaptioner(p2, s2, slots=4, admit_chunk=2,
                            eos_id=tiny_vocab.eos_id, kv_cache="int8")
