"""Multi-device SPMD tests on the 8-virtual-CPU mesh: dp+mp sharded training
step runs, matches the single-device step numerically, and keeps shardings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.models import base, s2vt
from vcr_tpu.parallel import make_mesh, shard_batch, shard_params
from vcr_tpu.train import optim
from vcr_tpu.train.step import build_step_fns


def make_spec(vocab):
    return base.ModelSpec(arch="s2vt", vocab_size=vocab.vocab_size,
                          embed_size=vocab.embed_size, hidden_size=8,
                          vid_feat_size=12, max_len=5, num_frames=4,
                          dropout_p=0.0, sos_id=vocab.sos_id,
                          compute_dtype="float32",
                          vocab_pad_to=8)  # vocab axis divisible for mp


@pytest.fixture
def setup(tiny_vocab, rng):
    spec = make_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    b = 8
    batch = {
        "vid_feats": rng.standard_normal((b, spec.num_frames, spec.vid_feat_size))
                        .astype(np.float32),
        "sent": rng.integers(0, spec.vocab_size, (b, spec.max_len)).astype(np.int32),
        "sent_len": np.full((b,), 4, np.int32),
        "valid": np.ones((b,), np.float32),
    }
    return spec, params, batch


def test_mesh_creation():
    assert jax.device_count() == 8
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"dp": 4, "mp": 2}


def test_sharded_train_step_matches_single_device(setup, tiny_vocab):
    spec, params, batch = setup
    optimizer = optim.build_optimizer("adam", 1e-3, 1e-4, 1.0)

    # single device
    train_step, eval_step = build_step_fns("s2vt", spec, optimizer)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    o1 = optimizer.init(p1)
    key = jax.random.PRNGKey(3)
    p1, o1, m1, pred1 = train_step(p1, o1, batch, key, 1.0)

    # 4x2 mesh, dp-sharded batch, mp-sharded vocab projection + embedding
    mesh = make_mesh(4, 2)
    p2 = shard_params(jax.tree_util.tree_map(jnp.copy, params), mesh,
                      spec.padded_vocab_size)
    o2 = optimizer.init(p2)
    sb = shard_batch(batch, mesh)
    train_step2, eval_step2 = build_step_fns("s2vt", spec, optimizer)
    p2, o2, m2, pred2 = train_step2(p2, o2, sb, key, 1.0)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(pred1), np.asarray(pred2))
    # updated params numerically identical
    for a, b_ in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    # eval greedy identical too
    me1, pe1 = eval_step(p1, batch)
    me2, pe2 = eval_step2(p2, shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(pe1), np.asarray(pe2))


def test_vocab_projection_is_sharded(setup, tiny_vocab):
    spec, params, _ = setup
    mesh = make_mesh(2, 4)
    sp = shard_params(params, mesh, spec.padded_vocab_size)
    w_sharding = sp["linear"]["w"].sharding
    assert w_sharding.spec == jax.sharding.PartitionSpec(None, "mp")
    emb_sharding = sp["embedding"]["table"].sharding
    assert emb_sharding.spec == jax.sharding.PartitionSpec("mp", None)
    # recurrent weights replicated
    assert sp["rnn1"]["w_ih"].sharding.spec == jax.sharding.PartitionSpec()


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_multihost_shard_index_math(tmp_path):
    """Per-process shard striding: across shards every sample appears exactly
    once per epoch, and ALL shards emit the SAME batch count even when shard
    lengths differ (padded valid=0 batches keep collectives in lockstep)."""
    import os

    from tests.util_corpus import build_corpus
    from vcr_tpu.data.pipeline import BatchIterator, CaptionDataset
    from vcr_tpu.vocab import Vocab

    tmp = str(tmp_path)
    glove = build_corpus(os.path.join(tmp, "data"), num_videos=13)
    vocab = Vocab(glove, seed=0)
    ds = CaptionDataset(os.path.join(tmp, "data"), "msvd_vgg", "train", vocab,
                        num_frames=4, max_len=6)

    nshards, b = 4, 2
    all_keys, counts = [], []
    for pidx in range(nshards):
        it = BatchIterator(ds, b, shuffle=True, seed=11, num_shards=nshards,
                           shard_index=pidx, use_native=False)
        it.epoch = 5
        batches = list(it)
        counts.append(len(batches))
        for batch in batches:
            n_valid = int(batch["valid"].sum())
            assert len(batch["vid_key"]) == n_valid
            assert batch["vid_feats"].shape[0] == b  # fixed global row count
            all_keys.extend(batch["vid_key"])
            # padded rows are really zeroed
            assert not batch["valid"][n_valid:].any()

    assert len(set(counts)) == 1            # lockstep: same batches everywhere
    assert counts[0] == 2                   # ceil(ceil(13/4)/2)
    assert sorted(all_keys) == sorted(
        ds.captions[i]["video_key"] for i in range(len(ds)))  # exactly once


def test_multihost_lockstep_padded_batches_finite_loss(tmp_path):
    """A fully-padded lockstep batch flows through the loss without NaNs."""
    import os

    import jax
    import jax.numpy as jnp

    from tests.util_corpus import build_corpus
    from vcr_tpu.data.pipeline import BatchIterator, CaptionDataset
    from vcr_tpu.train import losses
    from vcr_tpu.vocab import Vocab

    tmp = str(tmp_path)
    glove = build_corpus(os.path.join(tmp, "data"), num_videos=5)
    vocab = Vocab(glove, seed=0)
    ds = CaptionDataset(os.path.join(tmp, "data"), "msvd_vgg", "train", vocab,
                        num_frames=4, max_len=6)
    it = BatchIterator(ds, 2, shuffle=False, seed=0, num_shards=4,
                       shard_index=3, use_native=False)
    batches = list(it)
    assert len(batches) == 1                # ceil(ceil(5/4)/2)
    batch = batches[-1]
    assert batch["valid"].sum() < 2         # shard 3 holds a partial batch
    logits = jnp.zeros((2, 6, vocab.vocab_size))
    loss = losses.masked_cross_entropy(logits, jnp.asarray(batch["sent"]),
                                       jnp.asarray(batch["sent_len"]),
                                       jnp.asarray(batch["valid"]))
    assert bool(jnp.isfinite(loss))
    assert jax.process_count() == 1  # single-process harness; math is host-side


def test_sharded_lineage_beam_matches_single_device(tiny_vocab, rng):
    """The serving fast beam (lineage mode) under a dp x mp mesh must produce
    the single-device tokens exactly — the SPMD batch-decode path
    (tools.decode_corpus) rides this."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from vcr_tpu import decode as dec
    import vcr_tpu.models.transformer as tr

    spec = base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=12,
        max_len=8, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2)
    params = tr.init_params(jax.random.PRNGKey(7), spec, tiny_vocab.vectors)
    feats = rng.standard_normal((8, 4, 12)).astype(np.float32)

    mesh = make_mesh(4, 2)
    gf = jax.device_put(feats, NamedSharding(mesh, P("dp", None, None)))
    gp = jax.device_put(params, NamedSharding(mesh, P()))
    fn = jax.jit(partial(dec.transformer_beam_decode_fast, spec=spec,
                         beam_size=4, eos_id=tiny_vocab.eos_id))
    tok_sh, sc_sh = fn(gp, vid_feats=gf)
    tok_1, sc_1 = dec.transformer_beam_decode_fast(
        params, spec, jnp.asarray(feats), 4, tiny_vocab.eos_id)
    np.testing.assert_array_equal(np.asarray(tok_sh), np.asarray(tok_1))
    np.testing.assert_allclose(np.asarray(sc_sh), np.asarray(sc_1), atol=1e-5)
