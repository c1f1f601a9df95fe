"""SpatialNet and RationaleNet FULL-FORWARD token parity vs torch (VERDICT r1,
item 3) — the same treatment S2VT / S2VT-att / Transformer got in round 1.

* SpatialNet (eval) is fully deterministic: conv+BN(running stats)+ReLU trunk,
  per-frame spatial attention, encode_step splice, greedy decode
  (reference model/SpatialNet.py:87-142). Token-for-token + alpha parity.
* RationaleNet eval draws FRESH hard Gumbel noise (RationaleNet.py:49-50);
  parity is tested by injecting the SAME pre-drawn Gumbel(0,1) noise into both
  frameworks (rationale.apply's gumbel_noise hook) — selection probs AND
  greedy tokens must then agree exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import test_convert as tc
from vcr_tpu import convert
from vcr_tpu.models import rationale, s2vt, spatial


torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402


class TorchSpatialAttention(nn.Module):
    """Reference SpatialNet.Attention (SpatialNet.py:14-53): returns
    (context over raw feats, alphas)."""

    def __init__(self, hidden):
        super().__init__()
        self.key_layer = nn.Linear(hidden, hidden, bias=False)
        self.query_layer = nn.Linear(hidden, hidden, bias=False)
        self.energy_layer = nn.Linear(hidden, 1, bias=False)

    def forward(self, query, key, feats):
        b, h = query.shape
        proj_key = self.key_layer(key.contiguous().view(-1, h)).view(b, -1, h)
        q = self.query_layer(query)
        energy = torch.tanh(q.unsqueeze(1) + proj_key).view(-1, h)
        scores = self.energy_layer(energy).view(b, -1)
        alphas = TF.softmax(scores, dim=1)
        context = torch.bmm(alphas.unsqueeze(1), feats).squeeze(1)
        return context, alphas


class TorchSpatial(nn.Module):
    """state_dict-compatible skeleton of the reference SpatialNet with an
    s2vt captioner (SpatialNet.py:55-85)."""

    def __init__(self, vocab_size, embed_size, hidden, vid_feat):
        super().__init__()
        self.caption_net = tc.TorchS2VT(vocab_size, embed_size, hidden, vid_feat)
        self.conv = nn.Sequential(
            nn.Conv2d(vid_feat, hidden, 3, 1, 1), nn.BatchNorm2d(hidden),
            nn.ReLU(),
            nn.Conv2d(hidden, hidden, 3, 1, 1), nn.BatchNorm2d(hidden),
            nn.ReLU())
        self.attention = TorchSpatialAttention(hidden)


def torch_s2vt_decode_eval(m, output1, state1, max_len, sos_id, vid_feat_size,
                           embed_size):
    """The reference S2VT eval decode given encoder outputs/state
    (S2VTModel.py:103-107,148-177) — shared by SpatialNet, which splices its
    own encoder (SpatialNet.py:140)."""
    b = output1.shape[1]
    pad = torch.zeros(output1.shape[0], b, embed_size)
    _, state2 = m.rnn2(torch.cat([output1, pad], dim=2))
    vid_zero = torch.zeros(1, b, vid_feat_size)
    words = torch.full((1, b), sos_id, dtype=torch.long)
    toks = []
    for _ in range(max_len):
        o1, state1 = m.rnn1(vid_zero, state1)
        emb = m.embedding(words)
        o2, state2 = m.rnn2(torch.cat([o1, emb], dim=2), state2)
        outs = m.linear(o2.squeeze(0))
        words = torch.argmax(outs, dim=1).unsqueeze(0)
        toks.append(words.squeeze(0).numpy().copy())
    return np.stack(toks, axis=1)  # B x L


def torch_spatial_greedy(m: TorchSpatial, vid, max_len, sos_id, spec):
    """Reference SpatialNet eval forward (SpatialNet.py:87-142)."""
    with torch.no_grad():
        b, n, f, k, _ = vid.shape
        h = spec.hidden_size
        conv_feats = m.conv(vid.view(-1, f, k, k)).view(b, n, -1, k * k)
        conv_feats = conv_feats.transpose(2, 3)           # B x N x K² x H
        raw = vid.view(b, n, f, k * k).transpose(2, 3)    # B x N x K² x F
        state = torch.zeros(1, b, h)
        outs, alphas = [], []
        for i in range(n):
            ctx, al = m.attention(state.squeeze(0), conv_feats[:, i], raw[:, i])
            out, state = m.caption_net.rnn1(ctx.unsqueeze(0), state)
            outs.append(out)
            alphas.append(al.view(-1, k, k))
        output1 = torch.cat(outs, dim=0)                   # N x B x H
        toks = torch_s2vt_decode_eval(
            m.caption_net, output1, state, max_len, sos_id,
            spec.vid_feat_size, spec.embed_size)
        seq_alphas = torch.stack(alphas, dim=1)            # B x N x K x K
    return toks, seq_alphas.numpy()


def test_spatial_full_token_parity(tiny_vocab, rng):
    spec = tc.make_spec(tiny_vocab, arch="spatial", base_arch="s2vt",
                        vid_feat_size=6)
    tm = TorchSpatial(spec.vocab_size, spec.embed_size, spec.hidden_size,
                      spec.vid_feat_size).eval()
    # randomize BN affine + running stats so eval-BN parity is non-trivial
    for bn in (tm.conv[1], tm.conv[4]):
        bn.weight.data.normal_(1.0, 0.2)
        bn.bias.data.normal_(0.0, 0.2)
        bn.running_mean.normal_(0.0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
    params = convert.convert_spatial(tm.state_dict(), spec)

    vid = rng.standard_normal(
        (3, spec.num_frames, spec.vid_feat_size, 4, 4)).astype(np.float32)
    want_toks, want_alphas = torch_spatial_greedy(
        tm, torch.tensor(vid), spec.max_len, spec.sos_id, spec)

    logits, alphas, _ = spatial.apply(params, spec, jnp.asarray(vid),
                                      train=False)
    got = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(got, want_toks)
    np.testing.assert_allclose(np.asarray(alphas), want_alphas,
                               rtol=1e-5, atol=1e-6)


class TorchRationale(nn.Module):
    """state_dict-compatible skeleton of the reference RationaleNet with an
    s2vt captioner (RationaleNet.py:14-87)."""

    def __init__(self, vocab_size, embed_size, hidden, vid_feat):
        super().__init__()
        self.caption_net = tc.TorchS2VT(vocab_size, embed_size, hidden, vid_feat)

        class Gen(nn.Module):
            def __init__(self):
                super().__init__()
                self.rnn = nn.LSTM(vid_feat, hidden, bidirectional=True)
                self.linear = nn.Linear(2 * hidden, 2)

        self.gen = Gen()


def torch_rationale_greedy(m: TorchRationale, vid, noise, tau, max_len,
                           sos_id, spec):
    """Reference RationaleNet eval forward (RationaleNet.py:32-54,86-106)
    with INJECTED Gumbel noise replacing F.gumbel_softmax's internal draw
    (identical formula: softmax((logits+g)/tau), hard straight-through)."""
    with torch.no_grad():
        b, n, _ = vid.shape
        out, _ = m.gen.rnn(vid.transpose(0, 1))
        out = out.transpose(0, 1).contiguous()             # B x N x 2H
        logits = m.gen.linear(out.view(b * n, -1)).view(b, n, 2)
        y_soft = TF.softmax((logits + noise) / tau, dim=-1)
        idx = torch.argmax(y_soft, dim=-1)
        probs = TF.one_hot(idx, 2).float()                  # hard, eval mode
        sel = vid * probs[:, :, 1].unsqueeze(-1)
        toks = tc.torch_s2vt_greedy(m.caption_net, sel, max_len, sos_id,
                                    spec.vid_feat_size, spec.embed_size)
    return toks, probs.numpy()


def test_rationale_full_token_parity_shared_noise(tiny_vocab, rng):
    spec = tc.make_spec(tiny_vocab, arch="rationale", base_arch="s2vt", tau=1.0)
    tm = TorchRationale(spec.vocab_size, spec.embed_size, spec.hidden_size,
                        spec.vid_feat_size).eval()
    params = convert.convert_rationale(tm.state_dict(), spec)

    b = 3
    vid = rng.standard_normal(
        (b, spec.num_frames, spec.vid_feat_size)).astype(np.float32)
    u = rng.uniform(1e-6, 1.0, (b, spec.num_frames, 2))
    noise = (-np.log(-np.log(u))).astype(np.float32)  # Gumbel(0,1)

    want_toks, want_probs = torch_rationale_greedy(
        tm, torch.tensor(vid), torch.tensor(noise), spec.tau,
        spec.max_len, spec.sos_id, spec)

    logits, probs = rationale.apply(params, spec, jnp.asarray(vid), train=False,
                                    gumbel_noise=jnp.asarray(noise))
    got = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_allclose(np.asarray(probs), want_probs, atol=1e-6)
    np.testing.assert_array_equal(got, want_toks)


def test_base_arch_detected_from_wrapped_checkpoint(tiny_vocab, tmp_path):
    """A reference RationaleNet(s2vt-att) checkpoint loaded with a spec whose
    base_arch defaults to 's2vt' must auto-correct from the caption_net.*
    keys (convert.detect_base_arch) instead of dying in convert_s2vt with
    KeyError 'rnn1...'. Round-trip: export our rationale(s2vt-att) params to
    a reference-format .net, reload with the WRONG base spec."""
    import torch

    from vcr_tpu import convert
    from vcr_tpu.models import rationale

    spec_att = tc.make_spec(tiny_vocab, arch="rationale", base_arch="s2vt-att",
                            tau=1.0)
    params = rationale.init_params(jax.random.PRNGKey(0), spec_att,
                                   tiny_vocab.vectors)
    sd = convert.export_state_dict(params, spec_att, "rationale")
    assert convert.detect_base_arch(sd) == "s2vt-att"
    blob = {"state_dict": {k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()},
            "opts": None, "epoch": 0, "n_iter": 0}
    path = str(tmp_path / "rat_att.net")
    torch.save(blob, path)

    spec_wrong = spec_att.with_(base_arch="s2vt")   # deliberately wrong
    params2, meta = convert.load_reference_checkpoint(path, spec_wrong,
                                                      "rationale")
    assert meta["detected_base_arch"] == "s2vt-att"
    # converted tree has the att-base structure and round-trips numerically
    assert "encoder" in params2["caption_net"]
    a = np.asarray(params["caption_net"]["decoder"]["rnn"]["w_ih"])
    b = np.asarray(params2["caption_net"]["decoder"]["rnn"]["w_ih"])
    np.testing.assert_allclose(a, b, atol=1e-6)
