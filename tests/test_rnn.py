"""GRU/LSTM cells vs torch.nn.GRU/LSTM on CPU — gate-math parity is what makes
converted reference checkpoints decode token-for-token (SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.nn import rnn

torch = pytest.importorskip("torch")


def _copy_gru_params(tg, params):
    """Load vcr_tpu GRU params from a torch GRU (transpose to (in, gates))."""
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    return {
        "w_ih": jnp.asarray(sd["weight_ih_l0"].T),
        "w_hh": jnp.asarray(sd["weight_hh_l0"].T),
        "b_ih": jnp.asarray(sd["bias_ih_l0"]),
        "b_hh": jnp.asarray(sd["bias_hh_l0"]),
    }


def test_gru_matches_torch(rng):
    t, b, i, h = 7, 3, 5, 4
    xs = rng.standard_normal((t, b, i)).astype(np.float32)
    tg = torch.nn.GRU(input_size=i, hidden_size=h, num_layers=1)
    params = _copy_gru_params(tg, None)

    outs, h_last = rnn.gru_sequence(params, jnp.asarray(xs), compute_dtype=jnp.float32)
    with torch.no_grad():
        t_outs, t_h = tg(torch.tensor(xs))
    np.testing.assert_allclose(np.asarray(outs), t_outs.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), t_h.numpy()[0], atol=1e-5)


def test_gru_step_matches_sequence(rng):
    b, i, h = 2, 6, 5
    params = rnn.gru_init(jax.random.PRNGKey(0), i, h)
    x = jnp.asarray(rng.standard_normal((1, b, i)).astype(np.float32))
    outs, h_last = rnn.gru_sequence(params, x, compute_dtype=jnp.float32)
    h_step = rnn.gru_step(params, x[0], jnp.zeros((b, h)), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(h_step), atol=1e-6)


def test_bilstm_matches_torch(rng):
    t, b, i, h = 6, 2, 4, 3
    xs = rng.standard_normal((t, b, i)).astype(np.float32)
    tl = torch.nn.LSTM(input_size=i, hidden_size=h, bidirectional=True, num_layers=1)
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    params = {
        "fwd": {"w_ih": jnp.asarray(sd["weight_ih_l0"].T),
                "w_hh": jnp.asarray(sd["weight_hh_l0"].T),
                "b_ih": jnp.asarray(sd["bias_ih_l0"]),
                "b_hh": jnp.asarray(sd["bias_hh_l0"])},
        "bwd": {"w_ih": jnp.asarray(sd["weight_ih_l0_reverse"].T),
                "w_hh": jnp.asarray(sd["weight_hh_l0_reverse"].T),
                "b_ih": jnp.asarray(sd["bias_ih_l0_reverse"]),
                "b_hh": jnp.asarray(sd["bias_hh_l0_reverse"])},
    }
    outs = rnn.bilstm_sequence(params, jnp.asarray(xs), compute_dtype=jnp.float32)
    with torch.no_grad():
        t_outs, _ = tl(torch.tensor(xs))
    np.testing.assert_allclose(np.asarray(outs), t_outs.numpy(), atol=1e-5)
