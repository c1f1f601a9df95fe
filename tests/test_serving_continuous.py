"""Continuous-batching serving (vcr_tpu/serving_continuous.py).

Greedy parity oracle: a slot's harvested tokens must equal the family's
whole-batch decode (decode_tokens beam-1, which clamps finished rows to
<eos>) truncated after the first <eos> — same cell math, same argmax; the
continuous path merely stops stepping a finished slot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vcr_tpu.decode import decode_tokens
from vcr_tpu.models import base
from vcr_tpu.serving_continuous import ContinuousCaptioner

pytestmark = []


def _spec(tiny_vocab, arch, **kw):
    d = dict(arch=arch, vocab_size=tiny_vocab.vocab_size,
             embed_size=tiny_vocab.embed_size, hidden_size=8,
             vid_feat_size=12, max_len=7, num_frames=4, dropout_p=0.0,
             sos_id=tiny_vocab.sos_id, compute_dtype="float32")
    d.update(kw)
    return base.ModelSpec(**d)


def _greedy_truncated(params, spec, feats, eos_id):
    """Batch beam-1 rows, truncated after the first <eos> (the oracle)."""
    toks, _ = decode_tokens(params, spec, jnp.asarray(feats), eos_id,
                            beam_size=1)
    rows = np.asarray(toks)[:, 0]
    out = []
    for row in rows:
        hits = np.nonzero(row == eos_id)[0]
        out.append(row[: hits[0] + 1] if len(hits) else row)
    return out


def _feats(rng, n, spec):
    return rng.standard_normal(
        (n, spec.num_frames, spec.vid_feat_size)).astype(np.float32)


@pytest.mark.parametrize("arch", ["s2vt", "s2vt-att"])
def test_matches_batch_greedy(tiny_vocab, rng, arch):
    spec = _spec(tiny_vocab, arch)
    model = base.build_model(arch)[0]
    params = model(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    feats = _feats(rng, 7, spec)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)

    cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id)
    got = cc.caption_all({i: feats[i] for i in range(7)})
    assert sorted(got) == list(range(7))
    for i in range(7):
        np.testing.assert_array_equal(got[i], want[i])


@pytest.mark.parametrize("arch", ["s2vt", "s2vt-att", "transformer"])
def test_matches_batch_greedy_bf16(tiny_vocab, rng, arch):
    """Token-exact slot-pool parity at the SERVING default compute dtype.

    Regression guard for the pk-dtype bug: the slot pool stores the
    attention context stream `eo` at cdtype (safe — bahdanau_attend casts
    values to cdtype before the contraction either way), but `pk` MUST stay
    f32: bahdanau_project_keys returns f32 and bahdanau_attend adds it to
    the f32 query projection inside tanh with no cdtype cast, so a
    bf16-stored pk rounds the energies and diverges from the batch steppers
    at compute_dtype='bfloat16'."""
    kw = {"compute_dtype": "bfloat16"}
    if arch == "transformer":
        kw.update(tf_layers=2, tf_heads=2)
    spec = _spec(tiny_vocab, arch, **kw)
    model = base.build_model(arch)[0]
    params = model(jax.random.PRNGKey(5), spec, tiny_vocab.vectors)
    feats = _feats(rng, 6, spec)
    if arch == "transformer":
        # the slot stepper's exactness contract is vs the KV-CACHED fast
        # greedy (same per-step program); the full-recompute decode_tokens
        # path has different dot shapes and is not bit-equal at bf16
        import vcr_tpu.models.transformer as trm

        rows = np.asarray(trm.decode_greedy_fast(params, spec, trm.encode(
            params, spec, jnp.asarray(feats), trm.create_masks_inp(feats),
            jax.random.PRNGKey(0), train=False)))
        want = []
        for row in rows:
            hits = np.nonzero(row == tiny_vocab.eos_id)[0]
            want.append(row[: hits[0] + 1] if len(hits) else row)
    else:
        want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)

    cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id)
    got = cc.caption_all({i: feats[i] for i in range(6)})
    assert sorted(got) == list(range(6))
    for i in range(6):
        np.testing.assert_array_equal(got[i], want[i])


def test_streaming_arrivals_and_completion_order(tiny_vocab, rng):
    """Requests arriving from a lazy generator are all served; each result
    is yielded as its slot finishes (never more in flight than slots)."""
    spec = _spec(tiny_vocab, "s2vt")
    model = base.build_model("s2vt")[0]
    params = model(jax.random.PRNGKey(1), spec, tiny_vocab.vectors)
    feats = _feats(rng, 11, spec)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)

    served_before_exhaust = []

    def arrivals():
        for i in range(11):
            served_before_exhaust.append(i)
            yield i, feats[i]

    cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=4,
                             step_chunk=1, eos_id=tiny_vocab.eos_id)
    got = {}
    for key, toks in cc.caption_stream(arrivals()):
        got[key] = toks
        # lazy pull: the source can't have been drained much further than
        # the slot pool + one admission chunk ahead of completions
        assert len(served_before_exhaust) <= len(got) + cc.slots + cc.admit_chunk
    assert sorted(got) == list(range(11))
    for i in range(11):
        np.testing.assert_array_equal(got[i], want[i])


def test_slot_reuse_is_clean(tiny_vocab, rng):
    """More requests than slots: every slot is reused; late captions must not
    leak earlier occupants' state (admission resets everything)."""
    spec = _spec(tiny_vocab, "s2vt-att")
    model = base.build_model("s2vt-att")[0]
    params = model(jax.random.PRNGKey(5), spec, tiny_vocab.vectors)
    feats = _feats(rng, 9, spec)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             step_chunk=3, eos_id=tiny_vocab.eos_id)
    got = cc.caption_all({i: feats[i] for i in range(9)})
    for i in range(9):
        np.testing.assert_array_equal(got[i], want[i])


def test_spatial_family(tiny_vocab, rng):
    spec = _spec(tiny_vocab, "spatial", base_arch="s2vt", vid_feat_size=6)
    model = base.build_model("spatial")[0]
    params = model(jax.random.PRNGKey(2), spec, tiny_vocab.vectors)
    feats = rng.standard_normal(
        (5, spec.num_frames, spec.vid_feat_size, 3, 3)).astype(np.float32)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=2,
                             eos_id=tiny_vocab.eos_id)
    got = cc.caption_all({i: feats[i] for i in range(5)})
    for i in range(5):
        np.testing.assert_array_equal(got[i], want[i])


def test_rationale_family_zero_noise(tiny_vocab, rng):
    """RationaleNet's frame selection is stochastic per eval forward (fresh
    Gumbel noise, RationaleNet.py:50), so batch-vs-continuous parity is only
    defined under the deterministic zero-noise mode."""
    from vcr_tpu.nn import gumbel

    spec = _spec(tiny_vocab, "rationale", base_arch="s2vt", tau=1.0)
    model = base.build_model("rationale")[0]
    params = model(jax.random.PRNGKey(4), spec, tiny_vocab.vectors)
    feats = _feats(rng, 5, spec)

    old = gumbel.ZERO_NOISE
    gumbel.ZERO_NOISE = True
    try:
        want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)
        cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=2,
                                 eos_id=tiny_vocab.eos_id)
        got = cc.caption_all({i: feats[i] for i in range(5)})
    finally:
        gumbel.ZERO_NOISE = old
    for i in range(5):
        np.testing.assert_array_equal(got[i], want[i])


def test_transformer_matches_fast_greedy(tiny_vocab, rng):
    """The per-slot-position stepper (transformer.make_slot_stepper) with a
    uniform position vector is element-identical to the batch KV-cached fast
    greedy — so continuous captions equal decode_greedy_fast rows truncated
    after the first <eos>, across staggered admissions and slot reuse."""
    import vcr_tpu.models.transformer as trm

    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2)
    model = base.build_model("transformer")[0]
    params = model(jax.random.PRNGKey(6), spec, tiny_vocab.vectors)
    feats = _feats(rng, 7, spec)

    rows = np.asarray(trm.decode_greedy_fast(params, spec, trm.encode(
        params, spec, jnp.asarray(feats), trm.create_masks_inp(feats),
        jax.random.PRNGKey(0), train=False)))
    want = []
    for row in rows:
        hits = np.nonzero(row == tiny_vocab.eos_id)[0]
        want.append(row[: hits[0] + 1] if len(hits) else row)

    cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id)
    got = cc.caption_all({i: feats[i] for i in range(7)})
    for i in range(7):
        np.testing.assert_array_equal(got[i], want[i])


def test_stats_accounting(tiny_vocab, rng):
    """Scheduler observability: served/useful_steps/slot_steps must add up —
    useful_steps equals the sum of yielded caption lengths, occupancy is in
    (0, 1], and every request is counted."""
    spec = _spec(tiny_vocab, "s2vt")
    model = base.build_model("s2vt")[0]
    params = model(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    feats = _feats(rng, 8, spec)

    cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id)
    got = cc.caption_all({i: feats[i] for i in range(8)})
    s = cc.stats
    assert s["served"] == 8
    assert s["useful_steps"] == sum(len(t) for t in got.values())
    assert s["slot_steps"] == s["ticks"] * cc.slots * cc.step_chunk
    assert 0 < s["useful_steps"] <= s["slot_steps"]


def test_dp_mesh_matches_unsharded(tiny_vocab, rng):
    """Slot axis sharded over a dp mesh (GSPMD): same captions, token-exact
    — the admission scatter and the per-slot steps partition cleanly."""
    from vcr_tpu.parallel.mesh import make_mesh

    spec = _spec(tiny_vocab, "s2vt")
    model = base.build_model("s2vt")[0]
    params = model(jax.random.PRNGKey(8), spec, tiny_vocab.vectors)
    feats = _feats(rng, 10, spec)
    want = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                               eos_id=tiny_vocab.eos_id).caption_all(
        {i: feats[i] for i in range(10)})

    mesh = make_mesh(4)
    cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                             eos_id=tiny_vocab.eos_id, mesh=mesh)
    got = cc.caption_all({i: feats[i] for i in range(10)})
    for i in range(10):
        np.testing.assert_array_equal(got[i], want[i])

    with pytest.raises(ValueError):
        ContinuousCaptioner(params, spec, slots=5, admit_chunk=2,
                            eos_id=tiny_vocab.eos_id, mesh=mesh)


def test_dp_mp_mesh_matches_unsharded(tiny_vocab, rng):
    """TENSOR-PARALLEL serving: with a dp x mp mesh the pool shards params
    exactly like training (vocab projection column-wise, embedding table
    row-wise over mp — parallel.mesh.shard_params) and the slot axis over
    dp; the per-token logits come out vocab-sharded and GSPMD pulls the
    argmax reduction over mp. Token-exact vs the unsharded pool on the same
    padded spec. Transformer: the family with every mp-shardable piece
    (embedding gathers, vocab projection, per-slot KV caches on the dp
    axis)."""
    from vcr_tpu.parallel.mesh import make_mesh

    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2,
                 vocab_pad_to=4)  # padded vocab 20 % mp=4 == 0
    model = base.build_model("transformer")[0]
    params = model(jax.random.PRNGKey(9), spec, tiny_vocab.vectors)
    feats = _feats(rng, 8, spec)
    want = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                               eos_id=tiny_vocab.eos_id).caption_all(
        {i: feats[i] for i in range(8)})

    cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                             eos_id=tiny_vocab.eos_id, mesh=make_mesh(2, 4))
    # the vocab projection actually sharded (not silently replicated)
    pw = cc.params["decoder"]["pred_linear"]["w"]
    assert not pw.sharding.is_fully_replicated
    got = cc.caption_all({i: feats[i] for i in range(8)})
    for i in range(8):
        np.testing.assert_array_equal(got[i], want[i])


def test_dp_mp_mesh_int8_matches_unsharded(tiny_vocab, rng):
    """int8 KV cache x dp x mp (round 4): the quantized pool's extra state
    leaves (int8 codes + fp32 scales, still rows-leading) shard over dp like
    every other leaf, and sharding must not change the quantization values —
    token-exact vs the UNSHARDED int8 pool."""
    from vcr_tpu.parallel.mesh import make_mesh

    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2,
                 vocab_pad_to=4)
    model = base.build_model("transformer")[0]
    params = model(jax.random.PRNGKey(14), spec, tiny_vocab.vectors)
    feats = _feats(rng, 8, spec)
    want = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                               eos_id=tiny_vocab.eos_id,
                               kv_cache="int8").caption_all(
        {i: feats[i] for i in range(8)})
    cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                             eos_id=tiny_vocab.eos_id, kv_cache="int8",
                             mesh=make_mesh(2, 4))
    got = cc.caption_all({i: feats[i] for i in range(8)})
    for i in range(8):
        np.testing.assert_array_equal(got[i], want[i])


def test_dp_mp_mesh_beam_matches_unsharded(tiny_vocab, rng):
    """Tensor-parallel BEAM serving (ADVICE r3): the mp-sharded pool with
    beam_size>1 (transformer lineage slot stepper — per-group top-k over a
    vocab-sharded logit matrix, ancestry reorder on the dp-sharded slot axis)
    must stay token-exact vs the unsharded beam pool."""
    from vcr_tpu.parallel.mesh import make_mesh

    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2,
                 vocab_pad_to=4)
    model = base.build_model("transformer")[0]
    params = model(jax.random.PRNGKey(11), spec, tiny_vocab.vectors)
    feats = _feats(rng, 6, spec)
    want = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                               eos_id=tiny_vocab.eos_id,
                               beam_size=3).caption_all(
        {i: feats[i] for i in range(6)})

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id, beam_size=3,
                             mesh=make_mesh(2, 4))
    pw = cc.params["decoder"]["pred_linear"]["w"]
    assert not pw.sharding.is_fully_replicated
    got = cc.caption_all({i: feats[i] for i in range(6)})
    for i in range(6):
        np.testing.assert_array_equal(got[i], want[i])


def test_dp_mp_mesh_request_sampling(tiny_vocab, rng):
    """Tensor-parallel PER-REQUEST sampling (ADVICE r3): the row-wise
    temperature/top-k/top-p filters (two full-vocab sorts per token) run over
    mp-sharded logits. Greedy-parameter rows (T=1, top_k=1) must equal the
    unsharded greedy pool token-for-token, and a hot row must still yield a
    valid caption."""
    from vcr_tpu.parallel.mesh import make_mesh

    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2,
                 vocab_pad_to=4)
    model = base.build_model("transformer")[0]
    params = model(jax.random.PRNGKey(12), spec, tiny_vocab.vectors)
    feats = _feats(rng, 5, spec)
    want = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                               eos_id=tiny_vocab.eos_id).caption_all(
        {i: feats[i] for i in range(4)})

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id, mesh=make_mesh(2, 4),
                             request_sampling=True,
                             rng=jax.random.PRNGKey(13))

    def reqs():
        for i in range(4):
            yield i, feats[i], {"top_k": 1}
        yield "hot", feats[4], {"temperature": 3.0, "top_p": 0.9}

    got = dict(cc.caption_stream(reqs()))
    for i in range(4):
        np.testing.assert_array_equal(got[i], want[i])
    assert 1 <= len(got["hot"]) <= spec.max_len


def test_mp_mesh_unshardable_vocab_raises(tiny_vocab, rng):
    """ADVICE r3: an mp>1 mesh whose mp does not divide the padded vocab
    must raise (a silent replication fall-back defeats the HBM headroom the
    mesh was requested for)."""
    from vcr_tpu.parallel.mesh import make_mesh

    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2,
                 vocab_pad_to=1)  # padded vocab == raw vocab, % 4 != 0
    assert spec.padded_vocab_size % 4
    model = base.build_model("transformer")[0]
    params = model(jax.random.PRNGKey(14), spec, tiny_vocab.vectors)
    with pytest.raises(ValueError, match="not divisible by mesh mp"):
        ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                            eos_id=tiny_vocab.eos_id, mesh=make_mesh(2, 4))


@pytest.mark.parametrize("lineage", [False, True])
def test_masked_cache_write_bitwise(tiny_vocab, rng, lineage, monkeypatch):
    """VCR_SLOT_WRITE=masked (one-hot masked rewrites instead of per-row
    scatters — the on-chip A/B candidate, scripts/diag_slot_tick.py) must be
    BITWISE identical: a write is a pure data move."""
    from vcr_tpu.models import transformer as trm

    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2)
    params = base.build_model("transformer")[0](jax.random.PRNGKey(21), spec,
                                                tiny_vocab.vectors)
    feats = _feats(rng, 3, spec)
    eo = trm.encode(params, spec, jnp.asarray(feats),
                    trm.create_masks_inp(feats), jax.random.PRNGKey(0),
                    train=False)
    bt = 2 if lineage else 1

    def roll(mode):
        monkeypatch.setenv("VCR_SLOT_WRITE", mode)
        step, init_self, cross = trm.make_slot_stepper(
            params, spec, beam_tile=bt, lineage=lineage)
        rows = 3 * bt
        st = {**init_self(rows),
              **cross(jnp.repeat(eo, bt, axis=0) if bt > 1 else eo)}
        w = jnp.full((rows,), spec.sos_id, jnp.int32)
        logits = []
        for i in range(4):
            st, lg = step(st, w, jnp.full((rows,), i, jnp.int32))
            w = jnp.argmax(lg, -1).astype(jnp.int32)
            logits.append(np.asarray(lg))
        return np.stack(logits), st

    lg_s, st_s = roll("scatter")
    lg_m, st_m = roll("masked")
    np.testing.assert_array_equal(lg_s, lg_m)
    for a, b in zip(jax.tree_util.tree_leaves(st_s),
                    jax.tree_util.tree_leaves(st_m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _beam_truncated(params, spec, feats, eos_id, k):
    """Batch beam's BEST row per video, truncated after its first <eos>."""
    toks, _ = decode_tokens(params, spec, jnp.asarray(feats), eos_id,
                            beam_size=k)
    rows = np.asarray(toks)[:, 0]
    out = []
    for row in rows:
        hits = np.nonzero(row == eos_id)[0]
        out.append(row[: hits[0] + 1] if len(hits) else row)
    return out


@pytest.mark.parametrize("arch", ["s2vt", "s2vt-att"])
def test_continuous_beam_matches_batch_beam(tiny_vocab, rng, arch):
    """Continuous BEAM serving: each slot's K rows run the exact batch
    beam-search step; the harvested best-beam tokens must equal the batch
    beam's best row (per-request independence makes this a strict oracle),
    across staggered admissions and slot reuse."""
    for seed in (0, 4):
        spec = _spec(tiny_vocab, arch)
        model = base.build_model(arch)[0]
        params = model(jax.random.PRNGKey(seed), spec, tiny_vocab.vectors)
        feats = _feats(rng, 7, spec)
        want = _beam_truncated(params, spec, feats, tiny_vocab.eos_id, 3)

        cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=2,
                                 step_chunk=2, eos_id=tiny_vocab.eos_id,
                                 beam_size=3)
        got = cc.caption_all({i: feats[i] for i in range(7)})
        for i in range(7):
            np.testing.assert_array_equal(got[i], want[i])


def test_continuous_beam_spatial_and_rationale(tiny_vocab, rng):
    from vcr_tpu.nn import gumbel

    sp_spec = _spec(tiny_vocab, "spatial", base_arch="s2vt", vid_feat_size=6)
    model = base.build_model("spatial")[0]
    sp_params = model(jax.random.PRNGKey(2), sp_spec, tiny_vocab.vectors)
    sp_feats = rng.standard_normal(
        (5, sp_spec.num_frames, sp_spec.vid_feat_size, 3, 3)
    ).astype(np.float32)
    want = _beam_truncated(sp_params, sp_spec, sp_feats, tiny_vocab.eos_id, 2)
    cc = ContinuousCaptioner(sp_params, sp_spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id, beam_size=2)
    got = cc.caption_all({i: sp_feats[i] for i in range(5)})
    for i in range(5):
        np.testing.assert_array_equal(got[i], want[i])

    ra_spec = _spec(tiny_vocab, "rationale", base_arch="s2vt", tau=1.0)
    ra_params = base.build_model("rationale")[0](jax.random.PRNGKey(4),
                                                 ra_spec, tiny_vocab.vectors)
    ra_feats = _feats(rng, 4, ra_spec)
    old = gumbel.ZERO_NOISE
    gumbel.ZERO_NOISE = True
    try:
        want = _beam_truncated(ra_params, ra_spec, ra_feats,
                               tiny_vocab.eos_id, 2)
        cc = ContinuousCaptioner(ra_params, ra_spec, slots=2, admit_chunk=2,
                                 eos_id=tiny_vocab.eos_id, beam_size=2)
        got = cc.caption_all({i: ra_feats[i] for i in range(4)})
    finally:
        gumbel.ZERO_NOISE = old
    for i in range(4):
        np.testing.assert_array_equal(got[i], want[i])


def test_continuous_beam_transformer_matches_fast_beam(tiny_vocab, rng):
    """Transformer continuous beam = per-slot positions + the lineage
    (gather-free) beam: must match the batch fast beam's best row (the
    gather-path serving default; on CPU/fp32 the lineage and gather
    formulations agree token-for-token at these sizes) truncated after its
    first <eos>."""
    from vcr_tpu.decode import transformer_beam_decode_fast

    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2)
    params = base.build_model("transformer")[0](jax.random.PRNGKey(11), spec,
                                                tiny_vocab.vectors)
    feats = _feats(rng, 6, spec)
    toks, _ = transformer_beam_decode_fast(params, spec, jnp.asarray(feats),
                                           beam_size=3,
                                           eos_id=tiny_vocab.eos_id)
    rows = np.asarray(toks)[:, 0]
    want = []
    for row in rows:
        hits = np.nonzero(row == tiny_vocab.eos_id)[0]
        want.append(row[: hits[0] + 1] if len(hits) else row)

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id,
                             beam_size=3)
    got = cc.caption_all({i: feats[i] for i in range(6)})
    for i in range(6):
        np.testing.assert_array_equal(got[i], want[i])


def test_rejects_unknown_arch(tiny_vocab):
    class FakeSpec:
        arch = "nope"

    with pytest.raises(NotImplementedError):
        ContinuousCaptioner({}, FakeSpec())


# ------------------------------------------------- per-slot sampling (round 3)

@pytest.mark.parametrize("arch", ["s2vt", "transformer"])
def test_sampling_topk1_equals_greedy_pool(tiny_vocab, rng, arch):
    """top_k=1 collapses the per-slot categorical to argmax, so the sampling
    pool must be token-exact vs the greedy pool (and thus vs batch greedy)
    regardless of keys — the exactness anchor for the sampling machinery."""
    kw = dict(tf_layers=2, tf_heads=2) if arch == "transformer" else {}
    spec = _spec(tiny_vocab, arch, **kw)
    model = base.build_model(arch)[0]
    params = model(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    feats = _feats(rng, 6, spec)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)

    cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id,
                             sample_temperature=0.7, sample_top_k=1)
    got = cc.caption_all({i: feats[i] for i in range(6)})
    for i in range(6):
        np.testing.assert_array_equal(got[i], want[i])


def test_sampling_deterministic_per_rng_and_rerollable(tiny_vocab, rng):
    """Same rng + same admission order -> identical captions (reproducible
    serving); a different rng re-rolls the streams. Sampled outputs respect
    the eos/max_len protocol like greedy ones."""
    spec = _spec(tiny_vocab, "s2vt")
    model = base.build_model("s2vt")[0]
    params = model(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    feats = _feats(rng, 8, spec)
    reqs = {i: feats[i] for i in range(8)}

    def serve(seed):
        cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                                 step_chunk=3, eos_id=tiny_vocab.eos_id,
                                 sample_temperature=5.0,  # hot: streams differ
                                 rng=jax.random.PRNGKey(seed))
        return cc.caption_all(reqs)

    a1, a2, b = serve(0), serve(0), serve(1)
    for i in range(8):
        np.testing.assert_array_equal(a1[i], a2[i])
        toks = a1[i]
        assert 1 <= len(toks) <= spec.max_len
        eos_hits = np.nonzero(toks == tiny_vocab.eos_id)[0]
        if len(eos_hits):
            assert eos_hits[0] == len(toks) - 1  # cut at first eos
    assert any(not np.array_equal(a1[i], b[i]) for i in range(8)), \
        "independent rngs produced identical streams for all 8 requests"


def test_sampling_slot_stream_is_admission_indexed(tiny_vocab, rng):
    """A request's stream depends on its admission index, not on pool
    geometry: the same ordered request stream through differently-sized
    pools yields identical captions."""
    spec = _spec(tiny_vocab, "s2vt")
    model = base.build_model("s2vt")[0]
    params = model(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    feats = _feats(rng, 5, spec)

    def serve(slots, admit):
        cc = ContinuousCaptioner(params, spec, slots=slots, admit_chunk=admit,
                                 step_chunk=2, eos_id=tiny_vocab.eos_id,
                                 sample_temperature=5.0,
                                 rng=jax.random.PRNGKey(9))
        # ordered stream -> admission chunks are [0,1], [2,3], [4] for
        # admit=2 irrespective of slot count >= 2
        return dict(cc.caption_stream((i, feats[i]) for i in range(5)))

    a = serve(2, 2)
    b = serve(4, 2)
    for i in range(5):
        np.testing.assert_array_equal(a[i], b[i])


def test_sampling_rejects_beam_and_frozen_export(tiny_vocab, rng, tmp_path):
    spec = _spec(tiny_vocab, "s2vt")
    model = base.build_model("s2vt")[0]
    params = model(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    with pytest.raises(ValueError, match="mutually exclusive"):
        ContinuousCaptioner(params, spec, sample_temperature=0.5, beam_size=3)

    from vcr_tpu.config import Config
    from vcr_tpu.tools import export_continuous_artifact
    with pytest.raises(NotImplementedError, match="live-pool only"):
        export_continuous_artifact(Config(sample_temperature=0.5),
                                   str(tmp_path / "nonexistent"))


# --------------------------------- per-REQUEST sampling (vLLM-style, round 3)

def test_row_sampling_filters_match_scalar():
    """Uniform-row _row_sampling_filters must equal the scalar
    decode.apply_sampling_filters row-for-row across every filter combo
    (off, temperature-only, top_k, top_p, all three, argmax-collapse)."""
    from vcr_tpu.decode import apply_sampling_filters
    from vcr_tpu.serving_continuous import _row_sampling_filters

    g = np.random.default_rng(0)
    logits = jnp.asarray(g.standard_normal((5, 13)).astype(np.float32))
    for t, k, p in [(1.0, 0, 0.0), (0.7, 0, 0.0), (1.3, 4, 0.0),
                    (1.0, 0, 0.6), (0.5, 3, 0.8), (1.0, 1, 0.0),
                    (5.0, 0, 0.3)]:
        want = np.asarray(apply_sampling_filters(logits, t, k, p))
        got = np.asarray(_row_sampling_filters(
            logits, jnp.full((5,), t, jnp.float32),
            jnp.full((5,), k, jnp.int32), jnp.full((5,), p, jnp.float32)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   err_msg=f"combo t={t} k={k} p={p}")


def test_request_sampling_no_opts_is_greedy(tiny_vocab, rng):
    """A request_sampling pool whose pool-level temperature is 0 serves
    opt-less requests EXACTLY greedily (the per-row default T=1/top_k=1
    collapses the categorical to argmax) — the anchor that turning the
    capability on costs zero fidelity for plain requests."""
    spec = _spec(tiny_vocab, "s2vt")
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = _feats(rng, 6, spec)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)

    cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id,
                             request_sampling=True)
    assert cc.accepts_request_opts
    got = cc.caption_all({i: feats[i] for i in range(6)})
    for i in range(6):
        np.testing.assert_array_equal(got[i], want[i])


def test_per_request_opts_match_pool_level_config(tiny_vocab, rng):
    """A request carrying {"temperature": 5.0} through a greedy-default
    request_sampling pool must decode token-identically to the same stream
    through a pool BUILT with sample_temperature=5.0 (same rng -> same
    admission-indexed keys; opts start from neutral (1, 0, 0), not the
    greedy argmax trick)."""
    spec = _spec(tiny_vocab, "s2vt")
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = _feats(rng, 5, spec)

    pool_kw = dict(slots=2, admit_chunk=2, step_chunk=2,
                   eos_id=tiny_vocab.eos_id)
    cc_req = ContinuousCaptioner(params, spec, request_sampling=True,
                                 rng=jax.random.PRNGKey(7), **pool_kw)
    got = dict(cc_req.caption_stream(
        (i, feats[i], {"temperature": 5.0}) for i in range(5)))

    cc_pool = ContinuousCaptioner(params, spec, sample_temperature=5.0,
                                  rng=jax.random.PRNGKey(7), **pool_kw)
    want = dict(cc_pool.caption_stream((i, feats[i]) for i in range(5)))
    for i in range(5):
        np.testing.assert_array_equal(got[i], want[i])


def test_mixed_greedy_and_hot_requests_share_a_pool(tiny_vocab, rng):
    """Greedy and hot-nucleus requests decode side by side in one pool:
    opt-less rows and explicit temperature<=0 rows stay batch-greedy-exact
    while hot rows sample — per-slot parameters really are per-slot."""
    spec = _spec(tiny_vocab, "s2vt")
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = _feats(rng, 8, spec)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)

    def reqs():
        for i in range(8):
            if i % 4 == 1:
                yield i, feats[i], {"temperature": 8.0, "top_p": 0.95}
            elif i % 4 == 3:
                yield i, feats[i], {"temperature": 0.0}  # explicit greedy
            else:
                yield i, feats[i]

    cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id,
                             request_sampling=True,
                             rng=jax.random.PRNGKey(2))
    got = dict(cc.caption_stream(reqs()))
    assert sorted(got) == list(range(8))
    for i in range(8):
        if i % 4 != 1:
            np.testing.assert_array_equal(got[i], want[i])
        else:
            assert 1 <= len(got[i]) <= spec.max_len
    hot = [i for i in range(8) if i % 4 == 1]
    assert any(not np.array_equal(got[i], want[i]) for i in hot), \
        "T=8 nucleus requests all reproduced greedy output"


def test_opts_rejected_by_non_sampling_pools(tiny_vocab, rng):
    """Forwarding per-request opts to a pool that can't honor them is a loud
    ValueError (never a silently-ignored parameter): plain greedy pools and
    beam pools both refuse."""
    spec = _spec(tiny_vocab, "s2vt")
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = _feats(rng, 2, spec)

    for kw in (dict(), dict(beam_size=2)):
        cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                                 eos_id=tiny_vocab.eos_id, **kw)
        assert not getattr(cc, "accepts_request_opts", False)
        with pytest.raises(ValueError, match="per-request options"):
            list(cc.caption_stream([(0, feats[0], {"temperature": 2.0})]))

    with pytest.raises(ValueError, match="mutually exclusive"):
        ContinuousCaptioner(params, spec, request_sampling=True, beam_size=2)


def test_inflight_cancel_releases_slot_and_pool_stays_correct(tiny_vocab,
                                                              rng):
    """Cancelling an admitted request (client timed out) releases its slot
    immediately; later requests reuse the slot and still match the batch
    greedy oracle — release touches only `active`, never the decode state of
    other slots."""
    spec = _spec(tiny_vocab, "s2vt")
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = _feats(rng, 5, spec)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)
    # the cancel must land while key 0 is mid-decode: need >= 2 tokens
    assert len(want[0]) >= 2, "pick a different rng seed for this test"

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             step_chunk=1, eos_id=tiny_vocab.eos_id)
    offers = []

    def poll_cancelled(outstanding):
        if 0 in outstanding:
            offers.append(True)
            if len(offers) == 2:          # second offer = in flight
                return {0}
        return set()

    got = dict(cc.caption_stream(((i, feats[i]) for i in range(5)),
                                 poll_cancelled=poll_cancelled))
    assert 0 not in got
    assert sorted(got) == [1, 2, 3, 4]
    for i in range(1, 5):
        np.testing.assert_array_equal(got[i], want[i])
    assert cc.stats["cancelled"] == 1
    assert cc.stats["served"] == 4
    assert cc.in_flight == 0

    # the pool keeps serving correctly after a cancellation cycle
    got2 = cc.caption_all({10 + i: feats[i] for i in range(5)})
    for i in range(5):
        np.testing.assert_array_equal(got2[10 + i], want[i])


def test_inflight_cancel_under_dp_mesh(tiny_vocab, rng):
    """release_slots' fixed-shape active-scatter partitions cleanly under a
    dp-sharded slot pool: cancelled key gone, survivors token-exact vs the
    unsharded pool."""
    from vcr_tpu.parallel.mesh import make_mesh

    spec = _spec(tiny_vocab, "s2vt")
    model = base.build_model("s2vt")[0]
    params = model(jax.random.PRNGKey(8), spec, tiny_vocab.vectors)
    feats = _feats(rng, 6, spec)
    want = _greedy_truncated(params, spec, feats, tiny_vocab.eos_id)
    assert len(want[0]) >= 2, "pick a different rng seed for this test"

    cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                             step_chunk=1, eos_id=tiny_vocab.eos_id,
                             mesh=make_mesh(4))
    offers = []

    def poll_cancelled(outstanding):
        if 0 in outstanding:
            offers.append(True)
            if len(offers) == 2:
                return {0}
        return set()

    got = dict(cc.caption_stream(((i, feats[i]) for i in range(6)),
                                 poll_cancelled=poll_cancelled))
    assert 0 not in got and sorted(got) == [1, 2, 3, 4, 5]
    for i in range(1, 6):
        np.testing.assert_array_equal(got[i], want[i])
    assert cc.stats["cancelled"] == 1
