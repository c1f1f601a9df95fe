"""Transformer beam decode: width-1 equals the greedy scan token-for-token.

Widths follow the spec (transformer._width is spec-derived): these tests use
vid_feat_size=12 / embed_size=16 as stand-ins for the reference's 4096/300.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.decode import decode_tokens
from vcr_tpu.models import base
import vcr_tpu.models.transformer as tr


def _spec(tiny_vocab, max_len=6):
    return base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=12,
        max_len=max_len, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2)


def test_fast_decode_equals_parity_modulo_pe_scale(tiny_vocab, rng):
    """With the reference's sqrt(prefix_len) PE scale neutralized, the
    KV-cached fast decode must produce exactly the parity decode's tokens —
    proving the cache machinery itself is correct. (With the scale active the
    two modes differ by design; see decode_greedy_fast docstring.)"""
    orig = tr._pe_scale
    try:
        tr._pe_scale = lambda n: jnp.float32(1.0)
        spec = _spec(tiny_vocab)
        params = tr.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
        vid = jnp.asarray(rng.standard_normal((3, 4, 12)), dtype=jnp.float32)

        src_mask = tr.create_masks_inp(vid)
        e_out = tr.encode(params, spec, vid, src_mask, jax.random.PRNGKey(0),
                          train=False)
        parity = np.asarray(jnp.argmax(
            tr.decode_greedy(params, spec, e_out, src_mask), axis=-1))
        fast = np.asarray(tr.decode_greedy_fast(params, spec, e_out))
        np.testing.assert_array_equal(fast, parity)
    finally:
        tr._pe_scale = orig


def test_fast_decode_shapes_and_determinism(tiny_vocab, rng):
    spec = _spec(tiny_vocab, max_len=5)
    params = tr.init_params(jax.random.PRNGKey(1), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, 4, 12)), dtype=jnp.float32)
    src_mask = tr.create_masks_inp(vid)
    e_out = tr.encode(params, spec, vid, src_mask, jax.random.PRNGKey(0),
                      train=False)
    t1 = np.asarray(tr.decode_greedy_fast(params, spec, e_out))
    t2 = np.asarray(tr.decode_greedy_fast(params, spec, e_out))
    assert t1.shape == (2, spec.max_len) and t1.dtype == np.int32
    np.testing.assert_array_equal(t1, t2)


def test_transformer_beam1_equals_greedy(tiny_vocab, rng):
    spec = _spec(tiny_vocab, max_len=5)
    params = tr.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, 4, 12)), dtype=jnp.float32)

    greedy = np.asarray(jnp.argmax(
        tr.apply(params, spec, vid, train=False), axis=-1))
    tokens, scores = decode_tokens(params, spec, vid, tiny_vocab.eos_id,
                                   beam_size=1)
    t = np.asarray(tokens)
    for b in range(2):
        for i in range(spec.max_len):
            assert t[b, 0, i] == greedy[b, i]
            if greedy[b, i] == tiny_vocab.eos_id:
                break

    # wider beam never scores worse
    _, s3 = decode_tokens(params, spec, vid, tiny_vocab.eos_id, beam_size=3)
    assert np.all(np.asarray(s3)[:, 0] >= np.asarray(scores)[:, 0] - 1e-5)


def test_transformer_fast_beam1_equals_fast_greedy(tiny_vocab, rng):
    """KV-cached beam with width 1 must reproduce the KV-cached greedy decode
    token-for-token (same cell, same cache), and a wider fast beam never
    scores worse."""
    from vcr_tpu.decode import transformer_beam_decode_fast

    spec = _spec(tiny_vocab, max_len=5)
    params = tr.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((3, 4, 12)), dtype=jnp.float32)

    src_mask = tr.create_masks_inp(vid)
    e_out = tr.encode(params, spec, vid, src_mask, jax.random.PRNGKey(0),
                      train=False)
    greedy = np.asarray(tr.decode_greedy_fast(params, spec, e_out))
    tokens, scores = transformer_beam_decode_fast(
        params, spec, vid, 1, tiny_vocab.eos_id)
    t = np.asarray(tokens)
    for b in range(3):
        for i in range(spec.max_len):
            assert t[b, 0, i] == greedy[b, i]
            if greedy[b, i] == tiny_vocab.eos_id:
                break

    _, s3 = transformer_beam_decode_fast(params, spec, vid, 3,
                                         tiny_vocab.eos_id)
    assert np.all(np.asarray(s3)[:, 0] >= np.asarray(scores)[:, 0] - 1e-5)

def test_lineage_beam_equals_gather_beam(tiny_vocab, rng):
    """The gather-free lineage beam (ancestry-indexed attention reads, caches
    never physically reordered) produces the SAME tokens as the
    reorder-by-gather beam on CPU at fp32 test sizes. This is an empirical
    identity, not a guarantee: the two paths' attention dots have different
    shapes, which differ at f32 ulp and flip bf16 near-ties on the MXU —
    the guaranteed invariant is bookkeeping-exactness
    (test_lineage_bookkeeping.py); lineage-vs-gather on TPU is bounded by a
    logit envelope in tpu_checks.py instead."""
    from vcr_tpu.decode import transformer_beam_decode_fast

    for seed in (0, 1, 2):
        spec = _spec(tiny_vocab, max_len=8)
        params = tr.init_params(jax.random.PRNGKey(seed), spec,
                                tiny_vocab.vectors)
        vid = jnp.asarray(rng.standard_normal((4, 4, 12)), dtype=jnp.float32)
        t0, s0 = transformer_beam_decode_fast(params, spec, vid, 4,
                                              tiny_vocab.eos_id, lineage=False)
        t1, s1 = transformer_beam_decode_fast(params, spec, vid, 4,
                                              tiny_vocab.eos_id, lineage=True)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
