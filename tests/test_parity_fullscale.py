"""Token parity at the reference's REAL dimensions (H=512, 4096-d features,
~9k vocab, 30 frames, 20 tokens) — numerics at scale, not just tiny shapes."""

import numpy as np
import pytest

from vcr_tpu import convert
from vcr_tpu.models import base, s2vt
from vcr_tpu.vocab import tiny_vocab as make_vocab

torch = pytest.importorskip("torch")


def test_s2vt_parity_at_reference_dims(rng):
    import jax.numpy as jnp

    from tests.test_convert import TorchS2VT, torch_s2vt_greedy

    vocab = make_vocab([f"w{i}" for i in range(9000)], dim=300, seed=0)
    spec = base.ModelSpec(arch="s2vt", vocab_size=vocab.vocab_size,
                          embed_size=300, hidden_size=512, vid_feat_size=4096,
                          max_len=20, num_frames=30, dropout_p=0.0,
                          sos_id=vocab.sos_id, compute_dtype="float32")
    torch.manual_seed(0)
    tm = TorchS2VT(spec.vocab_size, spec.embed_size, spec.hidden_size,
                   spec.vid_feat_size)
    params = convert.convert_s2vt(tm.state_dict(), spec)

    b = 4
    vid = rng.standard_normal((b, 30, 4096)).astype(np.float32)
    want = torch_s2vt_greedy(tm, torch.tensor(vid), spec.max_len, spec.sos_id,
                             spec.vid_feat_size, spec.embed_size)
    logits = s2vt.apply(params, spec, jnp.asarray(vid), train=False)
    got = np.asarray(jnp.argmax(logits, axis=-1))
    # full-scale fp32: tokens must agree everywhere (ties measure-zero with
    # random weights)
    np.testing.assert_array_equal(got, want)
