"""Vocab padding neutrality: the same (converted) weights produce identical
greedy tokens and identical real-column logits with and without padding."""

import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu import convert
from vcr_tpu.models import base, s2vt

torch = pytest.importorskip("torch")


def test_padded_model_matches_unpadded(tiny_vocab, rng):
    from tests.test_convert import TorchS2VT

    base_kwargs = dict(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                       embed_size=tiny_vocab.embed_size, hidden_size=8,
                       vid_feat_size=12, max_len=6, num_frames=4,
                       dropout_p=0.0, sos_id=tiny_vocab.sos_id,
                       compute_dtype="float32")
    spec1 = base.ModelSpec(**base_kwargs, vocab_pad_to=1)
    spec8 = base.ModelSpec(**base_kwargs, vocab_pad_to=8)
    assert spec8.padded_vocab_size > spec8.vocab_size

    tm = TorchS2VT(spec1.vocab_size, spec1.embed_size, spec1.hidden_size,
                   spec1.vid_feat_size)
    p1 = convert.convert_s2vt(tm.state_dict(), spec1)
    p8 = convert.convert_s2vt(tm.state_dict(), spec8)
    assert p8["linear"]["w"].shape[1] == spec8.padded_vocab_size

    vid = jnp.asarray(rng.standard_normal((3, 4, 12)), dtype=jnp.float32)
    l1 = s2vt.apply(p1, spec1, vid, train=False)
    l8 = s2vt.apply(p8, spec8, vid, train=False)
    # identical real-column logits, identical greedy tokens
    np.testing.assert_allclose(np.asarray(l8[..., :spec1.vocab_size]),
                               np.asarray(l1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(l8, axis=-1)),
                                  np.asarray(jnp.argmax(l1, axis=-1)))
    # pad columns can never win
    assert np.asarray(l8[..., spec1.vocab_size:]).max() <= -1e8
