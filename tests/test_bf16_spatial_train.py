"""Regression: SpatialNet must TRAIN (grads through convs) in bfloat16 — the
conv VJP rejects mixed f32-cotangent/bf16-weight operands if the forward
requests a f32 preferred_element_type (caught on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.models import base, spatial
from vcr_tpu.train import losses


def test_spatial_bf16_grads(tiny_vocab, rng):
    spec = base.ModelSpec(arch="spatial", vocab_size=tiny_vocab.vocab_size,
                          embed_size=tiny_vocab.embed_size, hidden_size=8,
                          vid_feat_size=6, max_len=5, num_frames=3,
                          dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                          base_arch="s2vt", compute_dtype="bfloat16")
    params = spatial.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid = jnp.asarray(rng.standard_normal((2, 3, 6, 4, 4)), dtype=jnp.float32)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (2, 5)), dtype=jnp.int32)
    s_len = jnp.asarray([3, 4])

    def loss_fn(p):
        logits, _, _ = spatial.apply(p, spec, vid, s, rng=jax.random.PRNGKey(1),
                                     train=True)
        return losses.masked_cross_entropy(logits, s, s_len)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = float(jnp.abs(grads["conv1"]["w"]).sum())
    assert np.isfinite(g) and g > 0
