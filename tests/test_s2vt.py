"""S2VT model: shapes, determinism, jit/grad, and greedy-decode behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.models import base, s2vt


def make_spec(vocab, **kw):
    d = dict(arch="s2vt", vocab_size=vocab.vocab_size, embed_size=vocab.embed_size,
             hidden_size=8, vid_feat_size=12, max_len=5, num_frames=4,
             dropout_p=0.2, sos_id=vocab.sos_id, compute_dtype="float32")
    d.update(kw)
    return base.ModelSpec(**d)


def test_forward_shapes(tiny_vocab, rng):
    spec = make_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    b = 3
    vid = jnp.asarray(rng.standard_normal((b, spec.num_frames, spec.vid_feat_size)),
                      dtype=jnp.float32)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (b, spec.max_len)), dtype=jnp.int32)

    logits = s2vt.apply(params, spec, vid, s, rng=jax.random.PRNGKey(1),
                        train=True, teacher_force_prob=1.0)
    assert logits.shape == (b, spec.max_len, spec.vocab_size)

    eval_logits = s2vt.apply(params, spec, vid, train=False)
    assert eval_logits.shape == (b, spec.max_len, spec.vocab_size)


def test_greedy_decode_deterministic(tiny_vocab, rng):
    spec = make_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, spec.num_frames, spec.vid_feat_size)),
                      dtype=jnp.float32)
    l1 = s2vt.apply(params, spec, vid, train=False, rng=jax.random.PRNGKey(5))
    l2 = s2vt.apply(params, spec, vid, train=False, rng=jax.random.PRNGKey(99))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_teacher_forcing_feeds_targets(tiny_vocab, rng):
    """With tf_prob=1 the decode consumes teacher tokens; logits differ from
    tf_prob=0 (free-running) for the same params/input."""
    spec = make_spec(tiny_vocab, dropout_p=0.0)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, spec.num_frames, spec.vid_feat_size)),
                      dtype=jnp.float32)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (2, spec.max_len)), dtype=jnp.int32)
    key = jax.random.PRNGKey(7)
    lt = s2vt.apply(params, spec, vid, s, rng=key, train=True, teacher_force_prob=1.0)
    lf = s2vt.apply(params, spec, vid, s, rng=key, train=True, teacher_force_prob=0.0)
    # step 0 sees <sos> in both cases, so first-step logits must agree
    np.testing.assert_allclose(np.asarray(lt[:, 0]), np.asarray(lf[:, 0]), atol=1e-6)
    assert not np.allclose(np.asarray(lt[:, 1:]), np.asarray(lf[:, 1:]))
    # tf_prob=0 with dropout off must equal the eval greedy rollout
    le = s2vt.apply(params, spec, vid, train=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(le), atol=1e-6)


def test_jit_and_grad(tiny_vocab, rng):
    from vcr_tpu.train import losses

    spec = make_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, spec.num_frames, spec.vid_feat_size)),
                      dtype=jnp.float32)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (2, spec.max_len)), dtype=jnp.int32)
    s_len = jnp.asarray([3, 5])

    @jax.jit
    def loss_fn(p):
        logits = s2vt.apply(p, spec, vid, s, rng=jax.random.PRNGKey(1),
                            train=True, teacher_force_prob=1.0)
        return losses.masked_cross_entropy(logits, s, s_len)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every parameter except the (frozen-by-GloVe? no — embedding trains too)
    # receives some gradient signal
    assert any(float(jnp.abs(g).sum()) > 0 for g in flat)
