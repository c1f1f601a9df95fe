"""Rematerialized training step: identical loss/grad-driven update to the
plain step (jax.checkpoint must be numerically transparent)."""

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.models import base, s2vt
from vcr_tpu.train import optim
from vcr_tpu.train.step import build_step_fns


def test_remat_step_matches_plain(tiny_vocab, rng):
    spec = base.ModelSpec(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                          embed_size=tiny_vocab.embed_size, hidden_size=8,
                          vid_feat_size=12, max_len=5, num_frames=4,
                          dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                          compute_dtype="float32")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    optimizer = optim.build_optimizer("adam", 1e-3, 1e-4, 1.0)
    b = 4
    batch = {
        "vid_feats": jnp.asarray(rng.standard_normal((b, 4, 12)), jnp.float32),
        "sent": jnp.asarray(rng.integers(0, spec.vocab_size, (b, 5)), jnp.int32),
        "sent_len": jnp.full((b,), 3, jnp.int32),
        "valid": jnp.ones((b,), jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    outs = []
    for remat in (False, True):
        ts, _ = build_step_fns("s2vt", spec, optimizer, remat=remat)
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = optimizer.init(p)
        p, o, m, pred = ts(p, o, batch, key, 1.0)
        outs.append((p, float(m["loss"]), np.asarray(pred)))

    (p0, l0, pr0), (p1, l1, pr1) = outs
    assert abs(l0 - l1) < 1e-6
    np.testing.assert_array_equal(pr0, pr1)
    for a, b_ in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
