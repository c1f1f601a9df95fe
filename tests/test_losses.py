"""Unit tests for loss/metric primitives against hand-computed and torch-CPU
reference values (reference math: train_utils.py:22-95)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.train import losses, schedule


def test_sentence_mask():
    m = losses.sentence_mask(5, jnp.array([2, 5, 0]))
    expect = np.array([
        [1, 1, 0, 0, 0],
        [1, 1, 1, 1, 1],
        [0, 0, 0, 0, 0],
    ], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_masked_ce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    b, l, v = 4, 6, 11
    logits = rng.standard_normal((b, l, v)).astype(np.float32)
    target = rng.integers(0, v, (b, l))
    s_len = np.array([3, 6, 1, 4])

    got = float(losses.masked_cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                                            jnp.asarray(s_len)))

    # reference two-stage mean (train_utils.py:37-54)
    crit = torch.nn.CrossEntropyLoss(reduction="none")
    tl = crit(torch.tensor(logits).view(b * l, v), torch.tensor(target).view(-1)).view(b, l)
    mask = (torch.arange(l).expand(b, l) < torch.tensor(s_len).unsqueeze(-1)).float()
    want = float(((tl * mask).sum(dim=1) / mask.sum(dim=1)).mean())
    assert abs(got - want) < 1e-5


def test_masked_accuracy(rng):
    b, l, v = 3, 4, 7
    logits = rng.standard_normal((b, l, v)).astype(np.float32)
    target = np.argmax(logits, axis=-1)
    target[0, 0] = (target[0, 0] + 1) % v  # one wrong token inside the mask
    s_len = np.array([4, 2, 3])
    acc = float(losses.masked_accuracy(jnp.asarray(logits), jnp.asarray(target),
                                       jnp.asarray(s_len)))
    assert abs(acc - 8.0 / 9.0) < 1e-6


def test_rationale_losses():
    probs = np.zeros((2, 4, 2), dtype=np.float32)
    probs[..., 1] = np.array([[1, 0, 1, 0], [0.5, 0.5, 0.5, 0.5]])
    probs[..., 0] = 1 - probs[..., 1]
    cont = float(losses.continuity_loss(jnp.asarray(probs)))
    brev = float(losses.brevity_loss(jnp.asarray(probs)))
    rlen = float(losses.rationale_length(jnp.asarray(probs)))
    assert abs(cont - 0.5) < 1e-6  # mean of |1,-1,1| and |0,0,0| diffs = (3/3 + 0)/2
    assert abs(brev - 2.0) < 1e-6  # (2 + 2) / 2
    assert abs(rlen - 2.0) < 1e-6


def test_padded_rows_do_not_nan(rng):
    """All-padding rows (valid=0, s_len=0) must not produce NaN/Inf — the
    guards in the two-stage CE mean and accuracy denominators."""
    b, l, v = 4, 5, 7
    logits = rng.standard_normal((b, l, v)).astype(np.float32)
    target = rng.integers(0, v, (b, l))
    s_len = np.array([3, 0, 2, 0])     # rows 1 and 3 are padding
    valid = np.array([1.0, 0.0, 1.0, 0.0], np.float32)
    ce = float(losses.masked_cross_entropy(jnp.asarray(logits),
                                           jnp.asarray(target),
                                           jnp.asarray(s_len),
                                           jnp.asarray(valid)))
    acc = float(losses.masked_accuracy(jnp.asarray(logits), jnp.asarray(target),
                                       jnp.asarray(s_len), jnp.asarray(valid)))
    assert np.isfinite(ce) and np.isfinite(acc)
    # matches computing on only the valid rows
    ce_ref = float(losses.masked_cross_entropy(
        jnp.asarray(logits[[0, 2]]), jnp.asarray(target[[0, 2]]),
        jnp.asarray(s_len[[0, 2]])))
    assert abs(ce - ce_ref) < 1e-6
    # fully-empty batch: zero (guarded), not NaN
    ce0 = float(losses.masked_cross_entropy(
        jnp.asarray(logits), jnp.asarray(target),
        jnp.zeros(b, np.int32), jnp.zeros(b, np.float32)))
    assert np.isfinite(ce0)


def test_inverse_sigmoid():
    # reference docstring values (train_utils.py:11-20)
    probs = schedule.inverse_sigmoid(1000)
    assert abs(probs[0] - 0.9929078) < 1e-6
    assert abs(probs[-1] - 0.1002841) < 1e-6
    const = schedule.teacher_force_schedule(10, False)
    assert (const == 1.0).all()
