"""Beam search: width-1 equals greedy token-for-token; wider beams never score
worse; eos freezing works."""

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.decode import decode_tokens
from vcr_tpu.models import base, s2vt, s2vt_att


def make_spec(vocab, arch="s2vt"):
    return base.ModelSpec(arch=arch, vocab_size=vocab.vocab_size,
                          embed_size=vocab.embed_size, hidden_size=8,
                          vid_feat_size=12, max_len=6, num_frames=4,
                          dropout_p=0.0, sos_id=vocab.sos_id,
                          compute_dtype="float32")


def _greedy_tokens(module, params, spec, vid):
    logits = module.apply(params, spec, vid, train=False)
    return np.asarray(jnp.argmax(logits, axis=-1))


def test_beam1_equals_greedy_s2vt(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, "s2vt")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((3, 4, 12)), dtype=jnp.float32)
    greedy = _greedy_tokens(s2vt, params, spec, vid)
    tokens, scores = decode_tokens(params, spec, vid, tiny_vocab.eos_id, beam_size=1)
    # greedy rollout emits argmax each step; beam-1 must match until (and incl.)
    # the first <eos>, after which beam-1 freezes to <eos> — compare prefixes
    for b in range(3):
        g = greedy[b]
        bm = np.asarray(tokens)[b, 0]
        for t in range(spec.max_len):
            assert bm[t] == g[t]
            if g[t] == tiny_vocab.eos_id:
                break


def test_beam1_equals_greedy_s2vt_att(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, "s2vt-att")
    params = s2vt_att.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, 4, 12)), dtype=jnp.float32)
    greedy = _greedy_tokens(s2vt_att, params, spec, vid)
    tokens, _ = decode_tokens(params, spec, vid, tiny_vocab.eos_id, beam_size=1)
    for b in range(2):
        g, bm = greedy[b], np.asarray(tokens)[b, 0]
        for t in range(spec.max_len):
            assert bm[t] == g[t]
            if g[t] == tiny_vocab.eos_id:
                break


def test_wider_beam_never_scores_worse(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, "s2vt")
    params = s2vt.init_params(jax.random.PRNGKey(1), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((4, 4, 12)), dtype=jnp.float32)
    _, s1 = decode_tokens(params, spec, vid, tiny_vocab.eos_id, beam_size=1)
    _, s4 = decode_tokens(params, spec, vid, tiny_vocab.eos_id, beam_size=4)
    best1 = np.asarray(s1)[:, 0]
    best4 = np.asarray(s4)[:, 0]
    assert np.all(best4 >= best1 - 1e-5)
    # scores sorted best-first
    assert np.all(np.diff(np.asarray(s4), axis=1) <= 1e-6)


def test_beam_decode_wrapped_models(tiny_vocab, rng):
    """Rationale and Spatial beam decode run and return sane shapes; spatial
    beam-1 matches the model's greedy decode."""
    import jax.numpy as jnp

    from vcr_tpu.models import rationale, spatial

    spec = make_spec(tiny_vocab, "s2vt").with_(arch="rationale", base_arch="s2vt")
    params = rationale.init_params(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, 4, 12)), dtype=jnp.float32)
    tokens, scores = decode_tokens(params, spec, vid, tiny_vocab.eos_id,
                                   beam_size=2)
    assert tokens.shape == (2, 2, spec.max_len)

    spec_sp = make_spec(tiny_vocab, "s2vt").with_(
        arch="spatial", base_arch="s2vt", vid_feat_size=6)
    params_sp = spatial.init_params(jax.random.PRNGKey(4), spec_sp,
                                    tiny_vocab.vectors)
    vid_sp = jnp.asarray(rng.standard_normal((2, 4, 6, 4, 4)), dtype=jnp.float32)
    logits, _, _ = spatial.apply(params_sp, spec_sp, vid_sp, train=False)
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    tokens_sp, _ = decode_tokens(params_sp, spec_sp, vid_sp, tiny_vocab.eos_id,
                                 beam_size=1)
    t = np.asarray(tokens_sp)
    for b in range(2):
        for i in range(spec_sp.max_len):
            assert t[b, 0, i] == greedy[b, i]
            if greedy[b, i] == tiny_vocab.eos_id:
                break

    # spatial with the s2vt-att base: beam-1 == greedy too
    spec_att = spec_sp.with_(base_arch="s2vt-att")
    params_att = spatial.init_params(jax.random.PRNGKey(5), spec_att,
                                     tiny_vocab.vectors)
    logits_att, _, _ = spatial.apply(params_att, spec_att, vid_sp, train=False)
    greedy_att = np.asarray(jnp.argmax(logits_att, axis=-1))
    tokens_att, _ = decode_tokens(params_att, spec_att, vid_sp,
                                  tiny_vocab.eos_id, beam_size=1)
    ta = np.asarray(tokens_att)
    for b in range(2):
        for i in range(spec_att.max_len):
            assert ta[b, 0, i] == greedy_att[b, i]
            if greedy_att[b, i] == tiny_vocab.eos_id:
                break


def test_sampling_decode(tiny_vocab, rng):
    """Sampling decode: near-zero temperature reproduces greedy; top-k=1 is
    exactly greedy; different keys give different samples at T=1."""
    from vcr_tpu.decode import s2vt_sample_decode

    spec = make_spec(tiny_vocab, "s2vt")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((3, 4, 12)), dtype=jnp.float32)
    greedy = _greedy_tokens(s2vt, params, spec, vid)

    # top_k=1 forces the argmax regardless of key
    t1 = np.asarray(s2vt_sample_decode(params, spec, vid, jax.random.PRNGKey(1),
                                       tiny_vocab.eos_id, temperature=1.0,
                                       top_k=1))
    for b in range(3):
        for i in range(spec.max_len):
            assert t1[b, i] == greedy[b, i]
            if greedy[b, i] == tiny_vocab.eos_id:
                break

    # high temperature with different keys: decodes differ (overwhelmingly)
    a = np.asarray(s2vt_sample_decode(params, spec, vid, jax.random.PRNGKey(2),
                                      tiny_vocab.eos_id, temperature=2.0))
    b_ = np.asarray(s2vt_sample_decode(params, spec, vid, jax.random.PRNGKey(3),
                                       tiny_vocab.eos_id, temperature=2.0))
    assert not np.array_equal(a, b_)


def test_eos_freezes_beam(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, "s2vt")
    params = s2vt.init_params(jax.random.PRNGKey(2), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, 4, 12)), dtype=jnp.float32)
    tokens, _ = decode_tokens(params, spec, vid, tiny_vocab.eos_id, beam_size=3)
    t = np.asarray(tokens)
    for b in range(t.shape[0]):
        for k in range(t.shape[1]):
            seq = t[b, k]
            hit = np.where(seq == tiny_vocab.eos_id)[0]
            if len(hit) and hit[0] < len(seq) - 1:
                # after first eos, only eos repeats (frozen beam)
                assert np.all(seq[hit[0]:] == tiny_vocab.eos_id)


def test_sample_tokens_topk1_equals_greedy_all_families(tiny_vocab, rng):
    """sample_tokens with top_k=1 is deterministic argmax: equal (up to eos)
    to each family's greedy decode — s2vt-att, rationale, spatial vs their
    greedy rollouts; transformer vs its KV-cached fast greedy (sampling uses
    the serving stepper by design)."""
    from vcr_tpu.decode import sample_tokens
    from vcr_tpu.models import rationale, spatial
    import vcr_tpu.models.transformer as tr

    eos = tiny_vocab.eos_id

    def check_vs(greedy, tokens):
        t = np.asarray(tokens)
        for b in range(t.shape[0]):
            for i in range(greedy.shape[1]):
                assert t[b, i] == greedy[b, i]
                if greedy[b, i] == eos:
                    break

    # s2vt-att
    spec = make_spec(tiny_vocab, "s2vt-att")
    params = s2vt_att.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((3, 4, 12)), dtype=jnp.float32)
    check_vs(_greedy_tokens(s2vt_att, params, spec, vid),
             sample_tokens(params, spec, vid, eos, jax.random.PRNGKey(1),
                           top_k=1))

    # transformer (vs fast greedy: sampling rides the KV-cached stepper)
    spec_tr = base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=12,
        max_len=5, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2)
    p_tr = tr.init_params(jax.random.PRNGKey(0), spec_tr, tiny_vocab.vectors)
    src_mask = tr.create_masks_inp(vid)
    e_out = tr.encode(p_tr, spec_tr, vid, src_mask, jax.random.PRNGKey(0),
                      train=False)
    fast = np.asarray(tr.decode_greedy_fast(p_tr, spec_tr, e_out))
    check_vs(fast, sample_tokens(p_tr, spec_tr, vid, eos,
                                 jax.random.PRNGKey(1), top_k=1))

    # rationale: same generator key as the sampling path uses internally
    spec_r = make_spec(tiny_vocab, "rationale").with_(base_arch="s2vt",
                                                      tau=1.0)
    p_r = rationale.init_params(jax.random.PRNGKey(0), spec_r,
                                tiny_vocab.vectors)
    key = jax.random.PRNGKey(4)
    k_gen, _ = jax.random.split(key)
    sel, _probs = rationale.generator(p_r["gen"], spec_r, vid, k_gen,
                                      train=False)
    greedy_r = _greedy_tokens(s2vt, p_r["caption_net"],
                              spec_r.with_(arch="s2vt"), sel)
    check_vs(greedy_r, sample_tokens(p_r, spec_r, vid, eos, key, top_k=1))

    # spatial
    spec_sp = make_spec(tiny_vocab, "spatial").with_(base_arch="s2vt",
                                                     vid_feat_size=6)
    p_sp = spatial.init_params(jax.random.PRNGKey(0), spec_sp,
                               tiny_vocab.vectors)
    vid_sp = jnp.asarray(rng.standard_normal((2, 4, 6, 4, 4)),
                         dtype=jnp.float32)
    logits_sp, _, _ = spatial.apply(p_sp, spec_sp, vid_sp, train=False)
    greedy_sp = np.asarray(jnp.argmax(logits_sp, axis=-1))
    check_vs(greedy_sp, sample_tokens(p_sp, spec_sp, vid_sp, eos,
                                      jax.random.PRNGKey(5), top_k=1))


def test_sample_search_top_p_nucleus_membership():
    """top_p nucleus filtering: with a fixed step distribution, sampled
    tokens must come only from the smallest prefix of probability-sorted
    tokens whose mass reaches top_p (applied after top_k — HF semantics)."""
    from vcr_tpu.decode import sample_search

    # probs ~ [0.5, 0.3, 0.15, 0.05] over 4 tokens (token 3 is eos-free)
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]], jnp.float32))

    def step_fn(state, words, i):
        return state, jnp.broadcast_to(logits, (words.shape[0], 4))

    def sampled_set(top_p, top_k=0, n=256):
        toks = sample_search(step_fn, (), n, 4, sos_id=0, eos_id=3,
                             rng=jax.random.PRNGKey(0), temperature=1.0,
                             top_k=top_k, top_p=top_p)
        t = np.asarray(toks)
        live = t[:, 0]  # first step: no eos clamping yet
        return set(live.tolist())

    assert sampled_set(0.5) == {0}            # 0.5 reaches p -> only token 0
    assert sampled_set(0.79) == {0, 1}        # 0.5+0.3 crosses 0.79
    assert sampled_set(0.94) == {0, 1, 2}
    assert sampled_set(0.999) == {0, 1, 2, 3}
    assert sampled_set(0.0) == {0, 1, 2, 3}   # 0 = off
    # top_k first, then nucleus over the renormalized survivors:
    # top_k=2 keeps {0.5, 0.3} -> renorm {0.625, 0.375}; 0.625 >= p=0.6
    # so the nucleus is {0}; p=0.7 needs token 1 as well
    assert sampled_set(0.6, top_k=2) == {0}
    assert sampled_set(0.7, top_k=2) == {0, 1}


def test_sample_tokens_tiny_top_p_equals_greedy(tiny_vocab, rng):
    """A vanishing nucleus (top_p -> 0) keeps exactly the argmax token, so
    sample_tokens(top_p=1e-9) reproduces greedy like top_k=1 does."""
    from vcr_tpu.decode import sample_tokens

    spec = make_spec(tiny_vocab, "s2vt")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((3, 4, 12)), dtype=jnp.float32)
    greedy = _greedy_tokens(s2vt, params, spec, vid)
    toks = np.asarray(sample_tokens(params, spec, vid, tiny_vocab.eos_id,
                                    jax.random.PRNGKey(7), top_p=1e-9))
    eos = tiny_vocab.eos_id
    for b in range(toks.shape[0]):
        for i in range(greedy.shape[1]):
            assert toks[b, i] == greedy[b, i]
            if greedy[b, i] == eos:
                break
