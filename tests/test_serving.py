"""End-to-end serving graph (frames -> featurizer -> captioner) and the
eval-only checkpoint mode."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.models import base, s2vt, vgg
from vcr_tpu.serving import build_captioner


def test_serving_vgg_end_to_end(tiny_vocab, rng):
    spec = base.ModelSpec(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                          embed_size=tiny_vocab.embed_size, hidden_size=8,
                          vid_feat_size=4096, max_len=5, num_frames=2,
                          dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                          compute_dtype="float32")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    feat_params = vgg.init_params(jax.random.PRNGKey(1))
    caption = jax.jit(build_captioner(params, spec, "vgg16", feat_params))

    frames = jnp.asarray(rng.standard_normal((1, 2, 3, 224, 224)),
                         dtype=jnp.float32)
    tokens = caption(frames)
    assert tokens.shape == (1, spec.max_len)
    assert tokens.dtype == jnp.int32

    # matches featurize-then-caption done separately
    flat = frames.reshape(2, 3, 224, 224)
    feats = vgg.extract_fc7(feat_params, flat, spec.cdtype).reshape(1, 2, -1)
    want = s2vt.apply(params, spec, feats, train=False, emit="tokens")
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(want))


def test_serving_resnet_end_to_end(tiny_vocab, rng):
    from vcr_tpu.models import resnet

    spec = base.ModelSpec(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                          embed_size=tiny_vocab.embed_size, hidden_size=8,
                          vid_feat_size=512, max_len=5, num_frames=2,
                          dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                          compute_dtype="float32")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    feat_params = resnet.init_params(jax.random.PRNGKey(1), "resnet18")
    caption = jax.jit(build_captioner(params, spec, "resnet", feat_params))
    frames = jnp.asarray(rng.standard_normal((1, 2, 3, 64, 64)), jnp.float32)
    tokens = caption(frames)
    assert tokens.shape == (1, spec.max_len)


def test_eval_only_mode(tmp_path):
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.train.loop import evaluate_checkpoint, train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    cfg = tiny_config(tmp, epochs=1)
    trained = train(cfg)
    metrics = evaluate_checkpoint(cfg)
    # same checkpoint + deterministic eval => same val metrics
    assert abs(metrics["METEOR"] - trained["METEOR"]) < 1e-9
    assert abs(metrics["loss"] - trained["loss"]) < 1e-5
