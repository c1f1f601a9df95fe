"""Bookkeeping-exactness proof for the lineage beam's ancestry indexing.

Round-4 on-chip forensics (onchip_r4/tpu_checks.log) showed the lineage and
gather fast-beam paths agree bitwise at step 0 but drift by one bf16 quantum
from step 1: their attention DOT SHAPES differ (lineage `bthjs` vs gather
`bhqk`), and f32-ulp accumulation differences between different dot shapes
get amplified at the next astype(bf16) cast. That is a numerics property of
the MXU, not a bug in either path — no formulation can make two different
contractions bit-equal.

What IS provable bit-exactly is the part of the lineage design that could
actually be wrong: the ANCESTRY BOOKKEEPING. This test drives the SAME
lineage stepper (same `bthjs` attend, bit for bit) two ways:

  A. product path — caches written once, never moved; beam reorder permutes
     only the ancestry matrix (make_cached_stepper(lineage=True)'s
     lineage_reorder);
  B. oracle path — beam reorder PHYSICALLY permutes every KV-cache leaf
     (the textbook beam bookkeeping) and resets the ancestry to identity, so
     every attend reads each row's own, already-moved history.

Identical attend math on operand sets that are bit-identical iff the
ancestry selects exactly the right cache rows -> tokens AND scores must be
bit-identical. tpu_checks.py runs the same pair compiled on the real TPU at
the bf16 serving spec.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vcr_tpu.models.transformer as tr
from vcr_tpu.decode import beam_search
from vcr_tpu.models import base


def _spec(tiny_vocab, cdtype, max_len=10):
    return base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=12,
        max_len=max_len, num_frames=4, dropout_p=0.0,
        sos_id=tiny_vocab.sos_id, compute_dtype=cdtype, tf_layers=2,
        tf_heads=2)


def _run_beam(spec, params, vid, eos_id, k, reorder_mode, kv_cache=None):
    src_mask = tr.create_masks_inp(vid)
    e_out = tr.encode(params, spec, vid, src_mask, jax.random.PRNGKey(0),
                      train=False)
    step_fn, init_state, lineage_reorder = tr.make_cached_stepper(
        params, spec, e_out, beam_tile=k, lineage=True, kv_cache=kv_cache)
    rows = e_out.shape[0] * k
    anc_identity = jnp.tile((jnp.arange(rows, dtype=jnp.int32) % k)[:, None],
                            (1, spec.max_len))

    if reorder_mode == "ancestry":
        reorder_fn = lineage_reorder
    else:
        def reorder_fn(state, flat_src):
            # textbook bookkeeping: move every cache leaf, identity ancestry
            out = {kk: jax.tree_util.tree_map(lambda x: x[flat_src], v)
                   for kk, v in state.items() if kk != "anc"}
            out["anc"] = anc_identity
            return out

    return beam_search(step_fn, init_state, e_out.shape[0], k, spec.max_len,
                       spec.sos_id, eos_id, reorder_fn=reorder_fn)


@pytest.mark.parametrize("kv_cache", [None, "int8"])
@pytest.mark.parametrize("cdtype", ["float32", "bfloat16"])
def test_lineage_ancestry_equals_physical_reorder(tiny_vocab, rng, cdtype,
                                                  kv_cache):
    """kv_cache='int8' must preserve the contract: codes AND scales ride the
    same true gathers, so ancestry tracking stays bit-identical to physically
    permuting the (quantized) caches."""
    for seed in (0, 1):
        spec = _spec(tiny_vocab, cdtype)
        params = tr.init_params(jax.random.PRNGKey(seed), spec,
                                tiny_vocab.vectors)
        vid = jnp.asarray(rng.standard_normal((4, 4, 12)), jnp.float32)
        t_anc, s_anc = _run_beam(spec, params, vid, tiny_vocab.eos_id, 4,
                                 "ancestry", kv_cache)
        t_phy, s_phy = _run_beam(spec, params, vid, tiny_vocab.eos_id, 4,
                                 "physical", kv_cache)
        np.testing.assert_array_equal(np.asarray(t_anc), np.asarray(t_phy))
        # bit-identity, not tolerance: same ops on the same bits
        assert np.array_equal(np.asarray(s_anc), np.asarray(s_phy)), (
            np.asarray(s_anc), np.asarray(s_phy))
