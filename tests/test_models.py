"""Shape/determinism/grad tests for s2vt-att, transformer, rationale, spatial."""

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.models import base, rationale, s2vt_att, spatial, transformer
from vcr_tpu.train import losses


def make_spec(vocab, **kw):
    d = dict(arch="s2vt-att", vocab_size=vocab.vocab_size, embed_size=vocab.embed_size,
             hidden_size=8, vid_feat_size=12, max_len=5, num_frames=4,
             dropout_p=0.2, sos_id=vocab.sos_id, compute_dtype="float32",
             tau=1.0, base_arch="s2vt", tf_layers=2, tf_heads=2)
    d.update(kw)
    return base.ModelSpec(**d)


def _vid(rng, b, spec):
    return jnp.asarray(rng.standard_normal((b, spec.num_frames, spec.vid_feat_size)),
                       dtype=jnp.float32)


def test_s2vt_att_shapes_and_determinism(tiny_vocab, rng):
    spec = make_spec(tiny_vocab)
    params = s2vt_att.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = _vid(rng, 3, spec)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (3, spec.max_len)), dtype=jnp.int32)
    lt = s2vt_att.apply(params, spec, vid, s, rng=jax.random.PRNGKey(1), train=True)
    assert lt.shape == (3, spec.max_len, spec.vocab_size)
    l1 = s2vt_att.apply(params, spec, vid, train=False)
    l2 = s2vt_att.apply(params, spec, vid, train=False, rng=jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_transformer_shapes(tiny_vocab, rng):
    # widths follow the spec (transformer._width): vid_feat_size=12 /
    # embed_size=16 stand in for the reference's 4096/300
    import vcr_tpu.models.transformer as tr

    spec = make_spec(tiny_vocab, arch="transformer", vid_feat_size=12, hidden_size=8)
    # embed_size must be 16 to match the 'd' width here
    assert tiny_vocab.embed_size == 16
    params = transformer.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = _vid(rng, 2, spec)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (2, spec.max_len)), dtype=jnp.int32)
    s_len = jnp.asarray([3, 5])
    lt = transformer.apply(params, spec, vid, s, s_len,
                           rng=jax.random.PRNGKey(1), train=True)
    assert lt.shape == (2, spec.max_len, spec.vocab_size)
    le = transformer.apply(params, spec, vid, train=False)
    assert le.shape == (2, spec.max_len, spec.vocab_size)

    # greedy scan == explicit growing-prefix loop (the reference's decode
    # structure, TransformerNet.py:246-263)
    src_mask = transformer.create_masks_inp(vid)
    e_out = transformer.encode(params, spec, vid, src_mask,
                               jax.random.PRNGKey(0), train=False)
    b, l = 2, spec.max_len
    outputs = np.zeros((b, l), dtype=np.int32)
    outputs[:, 0] = spec.sos_id
    ref_logits = []
    for i in range(1, l + 1):
        x = jnp.take(params["decoder"]["embedding"]["table"],
                     jnp.asarray(outputs[:, :i]), axis=0)
        x = x * jnp.sqrt(jnp.asarray(float(i))) + params["decoder"]["pe"][None, :i]
        causal = jnp.asarray((np.triu(np.ones((i, i)), k=1) == 0))[None, None]

        def layer(p, h, k, eo, sm, tm):
            return tr._decoder_layer(p, h, eo, sm, tm, k, spec.tf_heads,
                                     train=False, cdtype=spec.cdtype)

        h = tr._run_stack(layer, params["decoder"]["layers"], x,
                          jax.random.PRNGKey(0), spec.tf_layers,
                          e_out, src_mask, causal)
        from vcr_tpu.nn.layers import dense, torch_norm
        h = torch_norm(params["decoder"]["norm_out"], h)
        outs = dense(params["decoder"]["pred_linear"], h[:, i - 1], spec.cdtype)
        ref_logits.append(np.asarray(outs))
        if i < l:
            outputs[:, i] = np.asarray(jnp.argmax(outs, axis=-1))
    ref_logits = np.stack(ref_logits, axis=1)
    np.testing.assert_allclose(np.asarray(le), ref_logits, atol=1e-4)


def test_rationale_shapes_and_hard_eval(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, arch="rationale", base_arch="s2vt")
    params = rationale.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = _vid(rng, 3, spec)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (3, spec.max_len)), dtype=jnp.int32)

    logits, probs = rationale.apply(params, spec, vid, s,
                                    rng=jax.random.PRNGKey(1), train=True)
    assert logits.shape == (3, spec.max_len, spec.vocab_size)
    assert probs.shape == (3, spec.num_frames, 2)
    p = np.asarray(probs)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    assert not np.all(np.isin(p, [0.0, 1.0]))  # soft in train

    _, probs_eval = rationale.apply(params, spec, vid, rng=jax.random.PRNGKey(2),
                                    train=False)
    pe = np.asarray(probs_eval)
    assert np.all(np.isin(pe, [0.0, 1.0]))  # hard one-hot at eval


def test_rationale_grads_flow_through_gumbel(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, arch="rationale", base_arch="s2vt", dropout_p=0.0)
    params = rationale.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = _vid(rng, 2, spec)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (2, spec.max_len)), dtype=jnp.int32)
    s_len = jnp.asarray([3, 5])

    def loss_fn(p):
        logits, probs = rationale.apply(p, spec, vid, s, rng=jax.random.PRNGKey(1),
                                        train=True)
        return (losses.masked_cross_entropy(logits, s, s_len)
                + losses.brevity_loss(probs) + losses.continuity_loss(probs))

    grads = jax.grad(loss_fn)(params)
    gen_grad = float(jnp.abs(grads["gen"]["linear"]["w"]).sum())
    assert np.isfinite(gen_grad) and gen_grad > 0


def test_spatial_shapes_and_alphas(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, arch="spatial", base_arch="s2vt",
                     vid_feat_size=6, num_frames=3, grid_size=4)
    params = spatial.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    b, k = 2, 4
    vid = jnp.asarray(rng.standard_normal((b, spec.num_frames, spec.vid_feat_size, k, k)),
                      dtype=jnp.float32)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (b, spec.max_len)), dtype=jnp.int32)

    logits, seq_alphas, bn_state = spatial.apply(params, spec, vid, s,
                                                 rng=jax.random.PRNGKey(1), train=True)
    assert logits.shape == (b, spec.max_len, spec.vocab_size)
    assert seq_alphas.shape == (b, spec.num_frames, k, k)
    a = np.asarray(seq_alphas).reshape(b, spec.num_frames, -1)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
    # train-mode BN must move the running stats
    assert not np.allclose(np.asarray(bn_state["bn1"]["mean"]),
                           np.asarray(params["bn1"]["mean"]))

    # s2vt-att base also works
    spec2 = spec.with_(base_arch="s2vt-att")
    params2 = spatial.init_params(jax.random.PRNGKey(0), spec2, tiny_vocab.vectors)
    logits2, _, _ = spatial.apply(params2, spec2, vid, s,
                                  rng=jax.random.PRNGKey(1), train=True)
    assert logits2.shape == (b, spec.max_len, spec.vocab_size)


def test_rationale_eval_step_uses_fresh_rng(tiny_vocab, rng):
    """Validation must draw FRESH Gumbel noise per batch (the torch eval
    draws per forward, RationaleNet.py:50): eval_step's rng argument has to
    reach the generator — a fixed default key would score every epoch's
    model selection under one noise draw."""
    from vcr_tpu.train import optim
    from vcr_tpu.train.step import build_step_fns

    spec = make_spec(tiny_vocab, arch="rationale", base_arch="s2vt",
                     dropout_p=0.0)
    params = rationale.init_params(jax.random.PRNGKey(0), spec,
                                   tiny_vocab.vectors)
    opt = optim.build_optimizer("adam", 1e-3, 0.0, 1.0)
    _, eval_step = build_step_fns("rationale", spec, opt, 1.0, 1.0)
    b = 4
    batch = {
        "vid_feats": jnp.asarray(
            rng.standard_normal((b, spec.num_frames, spec.vid_feat_size)),
            dtype=jnp.float32),
        "sent": jnp.asarray(rng.integers(0, spec.vocab_size,
                                         (b, spec.max_len)), dtype=jnp.int32),
        "sent_len": jnp.full((b,), spec.max_len, dtype=jnp.int32),
        "valid": jnp.ones((b,), dtype=jnp.float32),
    }
    m1, p1 = eval_step(params, batch, jax.random.PRNGKey(1))
    m1b, p1b = eval_step(params, batch, jax.random.PRNGKey(1))
    m2, p2 = eval_step(params, batch, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p1b))
    assert float(m1["loss"]) == float(m1b["loss"])
    # different keys -> different hard frame selections -> different outputs
    assert (float(m1["loss"]) != float(m2["loss"])
            or not np.array_equal(np.asarray(p1), np.asarray(p2)))


def test_gumbel_zero_noise_flag():
    """nn.gumbel.ZERO_NOISE (the run_equivalence harness hook) must make
    gumbel_softmax a deterministic softmax(logits/tau) — soft — and the
    straight-through one-hot of it — hard — matching the harness's patched
    torch F.gumbel_softmax with gumbels = 0."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vcr_tpu.nn import gumbel

    logits = jnp.asarray([[2.0, -1.0, 0.5], [0.0, 3.0, -2.0]])
    try:
        gumbel.ZERO_NOISE = True
        soft = gumbel.gumbel_softmax(jax.random.PRNGKey(0), logits, tau=2.0)
        np.testing.assert_allclose(
            np.asarray(soft), np.asarray(jax.nn.softmax(logits / 2.0)),
            rtol=1e-6)
        hard = gumbel.gumbel_softmax(jax.random.PRNGKey(1), logits, tau=2.0,
                                     hard=True)
        np.testing.assert_array_equal(
            np.asarray(hard == hard.max(axis=-1, keepdims=True)),
            np.asarray(jax.nn.one_hot(jnp.argmax(logits, -1), 3) == 1.0))
        # key must be irrelevant in zero-noise mode
        soft2 = gumbel.gumbel_softmax(jax.random.PRNGKey(7), logits, tau=2.0)
        np.testing.assert_array_equal(np.asarray(soft), np.asarray(soft2))
    finally:
        gumbel.ZERO_NOISE = False
    # and OFF again: two keys give different samples
    a = gumbel.gumbel_softmax(jax.random.PRNGKey(0), logits)
    b = gumbel.gumbel_softmax(jax.random.PRNGKey(1), logits)
    assert not np.allclose(np.asarray(a), np.asarray(b))
