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
    caption = build_captioner(params, spec, "vgg16", feat_params)

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
    caption = build_captioner(params, spec, "resnet", feat_params)
    frames = jnp.asarray(rng.standard_normal((1, 2, 3, 64, 64)), jnp.float32)
    tokens = caption(frames)
    assert tokens.shape == (1, spec.max_len)


def test_serving_eos_id_vocab_validation(tiny_vocab):
    """eos_id resolution (round-3 polish): a passed vocab supplies eos_id and
    cross-checks sos; mismatches raise instead of silently mis-decoding."""
    import pytest

    spec = base.ModelSpec(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                          embed_size=tiny_vocab.embed_size, hidden_size=8,
                          vid_feat_size=12, max_len=5, num_frames=2,
                          dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                          compute_dtype="float32")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)

    # vocab path works and agrees with an explicit matching eos_id
    build_captioner(params, spec, "none", vocab=tiny_vocab)
    build_captioner(params, spec, "none", vocab=tiny_vocab,
                    eos_id=tiny_vocab.eos_id)

    # explicit eos_id contradicting the vocab raises
    with pytest.raises(ValueError, match="contradicts"):
        build_captioner(params, spec, "none", vocab=tiny_vocab,
                        eos_id=tiny_vocab.eos_id + 1)

    # a spec whose sos doesn't match the vocab raises
    bad_spec = base.ModelSpec(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                              embed_size=tiny_vocab.embed_size, hidden_size=8,
                              vid_feat_size=12, max_len=5, num_frames=2,
                              dropout_p=0.0, sos_id=0, compute_dtype="float32")
    with pytest.raises(ValueError, match="does not match"):
        build_captioner(params, bad_spec, "none", vocab=tiny_vocab)


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


def test_serving_transformer_uses_fast_decode(tiny_vocab, rng):
    import vcr_tpu.models.transformer as tr

    spec = base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=12,
        max_len=5, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2)
    params = tr.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    caption = build_captioner(params, spec, "none")
    feats = jnp.asarray(rng.standard_normal((2, 4, 12)), jnp.float32)
    tokens = caption(feats)
    src_mask = tr.create_masks_inp(feats)
    e_out = tr.encode(params, spec, feats, src_mask, jax.random.PRNGKey(0),
                      train=False)
    want = tr.decode_greedy_fast(params, spec, e_out)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(want))


def test_serving_rationale_and_spatial(tiny_vocab, rng):
    from vcr_tpu.models import rationale, spatial

    # rationale: serving tokens == generator(rng) + wrapped-captioner greedy
    spec = base.ModelSpec(arch="rationale", base_arch="s2vt", tau=1.0,
                          vocab_size=tiny_vocab.vocab_size,
                          embed_size=tiny_vocab.embed_size, hidden_size=8,
                          vid_feat_size=12, max_len=5, num_frames=4,
                          dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                          compute_dtype="float32")
    params = rationale.init_params(jax.random.PRNGKey(0), spec,
                                   tiny_vocab.vectors)
    rng_key = jax.random.PRNGKey(7)
    caption = build_captioner(params, spec, "none", rng=rng_key)
    feats = jnp.asarray(rng.standard_normal((2, 4, 12)), jnp.float32)
    tokens = caption(feats)
    sel, _ = rationale.generator(params["gen"], spec, feats, rng_key,
                                 train=False)
    want = s2vt.apply(params["caption_net"], spec, sel, train=False,
                      emit="tokens")
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(want))

    # spatial: serving tokens == spatial.apply argmax
    spec_sp = base.ModelSpec(arch="spatial", base_arch="s2vt",
                             vocab_size=tiny_vocab.vocab_size,
                             embed_size=tiny_vocab.embed_size, hidden_size=8,
                             vid_feat_size=6, max_len=5, num_frames=3,
                             dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                             compute_dtype="float32")
    params_sp = spatial.init_params(jax.random.PRNGKey(1), spec_sp,
                                    tiny_vocab.vectors)
    caption_sp = build_captioner(params_sp, spec_sp, "none")
    grid = jnp.asarray(rng.standard_normal((2, 3, 6, 4, 4)), jnp.float32)
    tokens_sp = caption_sp(grid)
    logits, _, _ = spatial.apply(params_sp, spec_sp, grid, train=False)
    np.testing.assert_array_equal(np.asarray(tokens_sp),
                                  np.asarray(jnp.argmax(logits, axis=-1)))


def test_serving_beam_s2vt_and_transformer(tiny_vocab, rng):
    """beam_size>1 routes through beam search; beam-1-vs-greedy equivalence is
    covered per-family in test_decode*.py — here we pin the serving wiring:
    s2vt beam tokens == decode_tokens best row, transformer beam-1 == its fast
    greedy (same KV-cached cell)."""
    import vcr_tpu.models.transformer as tr
    from vcr_tpu import decode as vdecode

    spec = base.ModelSpec(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                          embed_size=tiny_vocab.embed_size, hidden_size=8,
                          vid_feat_size=12, max_len=5, num_frames=4,
                          dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                          compute_dtype="float32")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    feats = jnp.asarray(rng.standard_normal((2, 4, 12)), jnp.float32)
    caption = build_captioner(params, spec, "none", beam_size=3,
                              eos_id=tiny_vocab.eos_id)
    tokens = caption(feats)
    want, _ = vdecode.decode_tokens(params, spec, feats, tiny_vocab.eos_id, 3)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(want[:, 0]))

    spec_tr = base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=12,
        max_len=5, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2)
    params_tr = tr.init_params(jax.random.PRNGKey(0), spec_tr,
                               tiny_vocab.vectors)
    beam1 = build_captioner(params_tr, spec_tr, "none", beam_size=1)
    beam1_tokens = beam1(feats)
    beam1_via_beam = build_captioner(params_tr, spec_tr, "none",
                                     beam_size=2,
                                     eos_id=tiny_vocab.eos_id)
    tokens2 = beam1_via_beam(feats)
    assert tokens2.shape == beam1_tokens.shape
    # default eos_id derivation (sos+1) matches the vocab layout
    assert tiny_vocab.eos_id == spec_tr.sos_id + 1


def test_serving_sampled_topk1_equals_greedy(tiny_vocab, rng):
    """build_captioner(sample_temperature>0, top_k=1) is deterministic argmax
    — equal (up to eos) to the greedy serving captioner."""
    spec = base.ModelSpec(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                          embed_size=tiny_vocab.embed_size, hidden_size=8,
                          vid_feat_size=12, max_len=5, num_frames=4,
                          dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                          compute_dtype="float32")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    feats = jnp.asarray(rng.standard_normal((2, 4, 12)), jnp.float32)
    greedy = np.asarray(build_captioner(params, spec, "none")(feats))
    sampled = np.asarray(build_captioner(
        params, spec, "none", sample_temperature=1.0, sample_top_k=1)(feats))
    for b in range(2):
        for i in range(spec.max_len):
            assert sampled[b, i] == greedy[b, i]
            if greedy[b, i] == tiny_vocab.eos_id:
                break


def test_serving_yolo_featurizer_matches_precomputed(tmp_path, tiny_vocab, rng):
    """build_captioner(featurizer='yolo'): the fused darknet-backbone path
    must equal captioning precomputed get_feats features — and the backbone
    weights ride as jit ARGUMENTS (threaded pytree), not baked constants."""
    from vcr_tpu.models import darknet, spatial

    # forward-valid tiny cfg (the parser-test TINY_CFG's shortcut has
    # mismatched shapes): conv8 -> conv16/s2 -> conv16 -> shortcut -> conv24
    # -> yolo; get_feats cut = outputs[first_yolo - 2] = the shortcut map
    cfg_text = """
[net]
height=32
width=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
filters=24
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326
classes=3
num=9
"""
    cfg_path = tmp_path / "tiny_fwd.cfg"
    cfg_path.write_text(cfg_text)
    net = darknet.Darknet(str(cfg_path), key=jax.random.PRNGKey(0))

    b, n, s = 2, 3, 32
    frames = jnp.asarray(rng.standard_normal((b, n, 3, s, s)), jnp.float32)
    flat_feats = net.get_feats(frames.reshape(b * n, 3, s, s), jnp.float32)
    feats = flat_feats.reshape(b, n, *flat_feats.shape[1:])
    f, k = feats.shape[2], feats.shape[3]

    spec = base.ModelSpec(
        arch="spatial", base_arch="s2vt", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=f,
        max_len=5, num_frames=n, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", grid_size=k)
    params = spatial.init_params(jax.random.PRNGKey(1), spec,
                                 tiny_vocab.vectors)

    fused = build_captioner(params, spec, "yolo", feat_params=net)
    precomp = build_captioner(params, spec, "none")
    np.testing.assert_array_equal(np.asarray(fused(frames)),
                                  np.asarray(precomp(feats)))
