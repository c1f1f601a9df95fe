"""Gradient accumulation (Config.grad_accum / build_step_fns(grad_accum=N)).

The masked losses are means over VALID rows (losses.masked_cross_entropy), so
combining microbatch gradients weighted by valid count reproduces EXACTLY the
full-batch gradient — these tests pin that equality through a real optimizer
step, including a padding-heavy batch where the microbatch valid counts
differ. No reference equivalent (the reference is single-GPU with bsize 32);
this is the TPU-native route to large effective batches past activation-memory
/ emitted-program-size ceilings (e.g. SpatialNet's B=32 tunnel limit).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.models import base
from vcr_tpu.train import optim
from vcr_tpu.train.step import build_step_fns


def _setup(tiny_vocab, arch, rng, **spec_kw):
    kw = dict(arch=arch, vocab_size=tiny_vocab.vocab_size,
              embed_size=tiny_vocab.embed_size, hidden_size=8,
              vid_feat_size=12, max_len=5, num_frames=4,
              dropout_p=0.0, sos_id=tiny_vocab.sos_id,
              compute_dtype="float32")
    kw.update(spec_kw)
    spec = base.ModelSpec(**kw)
    init_fn, _ = base.build_model(arch)
    params = init_fn(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    opt = optim.build_optimizer("adam", 1e-3, 4e-5, 1.0)
    return spec, params, opt


def _batch(rng, b, valid=None, feat_shape=(4, 12)):
    return {
        "vid_feats": jnp.asarray(rng.standard_normal((b, *feat_shape)),
                                 jnp.float32),
        "sent": jnp.asarray(rng.integers(0, 16, (b, 5)), jnp.int32),
        "sent_len": jnp.asarray(rng.integers(2, 5, (b,)), jnp.int32),
        "valid": jnp.asarray(valid if valid is not None else np.ones(b),
                             jnp.float32),
    }


@pytest.mark.parametrize("arch", ["s2vt", "s2vt-att"])
def test_accum_matches_full_batch(tiny_vocab, rng, arch):
    """accum=2 and accum=4 produce the same post-step params as accum=1 on the
    same batch (dropout 0, tf 1.0 => deterministic forward), including with a
    padding row that makes the microbatch valid counts unequal."""
    spec, params, opt = _setup(tiny_vocab, arch, rng)
    valid = np.ones(8)
    valid[5] = 0.0  # a padded row: microbatch valid counts 4 vs 3
    batch = _batch(rng, 8, valid=valid)
    key = jax.random.PRNGKey(1)

    def fresh(tree):
        # train_step donates params/opt_state; each run needs its own copy
        return jax.tree_util.tree_map(jnp.array, tree)

    results = {}
    for accum in (1, 2, 4):
        step, _ = build_step_fns(arch, spec, opt, grad_accum=accum)
        p2, _, metrics, pred = step(fresh(params), opt.init(fresh(params)),
                                    batch, key, 1.0)
        results[accum] = (p2, metrics, pred)

    p1, m1, pred1 = results[1]
    for accum in (2, 4):
        pa, ma, preda = results[accum]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b), atol=2e-6),
            p1, pa)
        np.testing.assert_allclose(float(ma["loss"]), float(m1["loss"]),
                                   atol=1e-6)
        np.testing.assert_allclose(float(ma["acc"]), float(m1["acc"]),
                                   atol=1e-6)
        # predictions are per-row argmax of the same forward
        np.testing.assert_array_equal(np.asarray(preda), np.asarray(pred1))


def test_accum_rationale_three_term_loss(tiny_vocab, rng):
    """RationaleNet's 3-term loss is also a mean over valid rows per term, so
    the combination stays exact — with the Gumbel noise neutralized
    (nn.gumbel ZERO_NOISE) so accum=1 and accum=2 see identical forwards."""
    from vcr_tpu.nn import gumbel

    spec, params, opt = _setup(tiny_vocab, "rationale", rng,
                               base_arch="s2vt", tau=1.0)
    batch = _batch(rng, 4)
    key = jax.random.PRNGKey(1)
    old = gumbel.ZERO_NOISE
    gumbel.ZERO_NOISE = True
    try:
        outs = []
        fresh = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
        for accum in (1, 2):
            step, _ = build_step_fns("rationale", spec, opt, 0.5, 0.5,
                                     grad_accum=accum)
            p2, _, metrics, _ = step(fresh(params), opt.init(fresh(params)),
                                     batch, key, 1.0)
            outs.append((p2, metrics))
    finally:
        gumbel.ZERO_NOISE = old
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-6),
        outs[0][0], outs[1][0])
    for k in ("loss", "loss_ce", "loss_brev", "loss_cont", "len"):
        np.testing.assert_allclose(float(outs[0][1][k]), float(outs[1][1][k]),
                                   atol=1e-6)


def test_accum_spatial_bn_follows_last_microbatch(tiny_vocab, rng):
    """SpatialNet under accumulation: gradient-trained params match the
    full-batch step to BN-stats-induced tolerance is NOT claimed (BN batch
    stats differ by design); pinned instead: the step runs, the loss is
    finite, and the merged BN running stats equal the LAST microbatch's."""
    spec, params, opt = _setup(tiny_vocab, "spatial", rng, base_arch="s2vt",
                               vid_feat_size=6, grid_size=4, num_frames=3)
    batch = _batch(rng, 4, feat_shape=(3, 6, 4, 4))
    key = jax.random.PRNGKey(1)
    fresh = jax.tree_util.tree_map(jnp.array, params)
    step, _ = build_step_fns("spatial", spec, opt, grad_accum=2)
    p2, _, metrics, _ = step(fresh, opt.init(fresh), batch, key, 1.0)
    assert np.isfinite(float(metrics["loss"]))

    # recompute the last microbatch's BN stats with a bare forward and compare
    from vcr_tpu.models import spatial

    mb = jax.tree_util.tree_map(lambda v: v[2:], batch)
    _, _, bn_state = spatial.apply(params, spec, mb["vid_feats"], mb["sent"],
                                   mb["sent_len"],
                                   rng=jax.random.fold_in(key, 1), train=True,
                                   teacher_force_prob=1.0)
    for bn_name, stats in bn_state.items():
        for field in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(p2[bn_name][field]),
                                       np.asarray(stats[field]), atol=1e-6)


def test_accum_indivisible_batch_raises(tiny_vocab, rng):
    spec, params, opt = _setup(tiny_vocab, "s2vt", rng)
    step, _ = build_step_fns("s2vt", spec, opt, grad_accum=3)
    fresh = jax.tree_util.tree_map(jnp.array, params)
    with pytest.raises(ValueError, match="divisible"):
        step(fresh, opt.init(fresh), _batch(rng, 8), jax.random.PRNGKey(0),
             1.0)


def test_accum_composes_with_dp_mesh(tiny_vocab, rng):
    """grad_accum under a dp-sharded mesh: the microbatch reshape slices the
    dp-sharded batch axis and GSPMD re-partitions each microbatch — the
    post-step params must equal the unsharded accumulation run."""
    from vcr_tpu.parallel import make_mesh, shard_batch, shard_params

    spec, params, opt = _setup(tiny_vocab, "s2vt", rng)
    batch = _batch(rng, 16)
    key = jax.random.PRNGKey(1)
    step, _ = build_step_fns("s2vt", spec, opt, grad_accum=2)

    fresh = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
    p_plain, _, m_plain, _ = step(fresh(params), opt.init(fresh(params)),
                                  batch, key, 1.0)

    mesh = make_mesh(8, 1)
    p_sh = shard_params(fresh(params), mesh, spec.padded_vocab_size)
    b_sh = shard_batch(dict(batch), mesh)
    p_mesh, _, m_mesh, _ = step(p_sh, opt.init(p_sh), b_sh, key, 1.0)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-6),
        p_plain, p_mesh)
    np.testing.assert_allclose(float(m_mesh["loss"]), float(m_plain["loss"]),
                               atol=1e-6)


def test_accum_through_training_loop(tmp_path):
    """--grad_accum 2 through the REAL loop: trains, evaluates, checkpoints."""
    import dataclasses
    import os

    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    cfg = dataclasses.replace(tiny_config(tmp, epochs=1), grad_accum=2)
    out = train(cfg)
    assert np.isfinite(out["loss"])
