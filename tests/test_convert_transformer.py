"""Transformer full-stack numeric parity: build the reference architecture in
torch (CPU, same structure/naming as model/TransformerNet.py but without its
hard-coded .cuda()), convert the state_dict, and compare:

* encoder outputs (eval mode)
* train-mode decoder logits (unshifted input + length∧causal mask)
* greedy decode tokens (growing-prefix loop)

Small widths are used (spec vid_feat_size/embed_size) so the test runs
quickly; the width *structure* (separate encoder/decoder widths, hidden
projection) is the same as the real 4096/300 model.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vcr_tpu.models.transformer as tr
from vcr_tpu import convert
from vcr_tpu.models import base

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

E_W, D_W = 12, 16  # encoder/decoder widths standing in for 4096/300


class TMHA(nn.Module):
    def __init__(self, heads, hidden, flag):
        super().__init__()
        self.h, self.d_k = heads, hidden // heads
        self.hidden = hidden
        q_in, k_in, v_in = {"e": (E_W,) * 3, "d": (D_W,) * 3,
                            "ed": (D_W, E_W, E_W)}[flag]
        self.q_linear = nn.Linear(q_in, hidden)
        self.v_linear = nn.Linear(v_in, hidden)
        self.k_linear = nn.Linear(k_in, hidden)
        self.out = nn.Linear(hidden, q_in)

    def forward(self, q, k, v, mask=None):
        bs = q.size(0)
        k = self.k_linear(k).view(bs, -1, self.h, self.d_k).transpose(1, 2)
        q = self.q_linear(q).view(bs, -1, self.h, self.d_k).transpose(1, 2)
        v = self.v_linear(v).view(bs, -1, self.h, self.d_k).transpose(1, 2)
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.d_k)
        if mask is not None:
            scores = scores.masked_fill(mask == 0, -1e9)
        out = TF.softmax(scores, dim=-1) @ v
        concat = out.transpose(1, 2).contiguous().view(bs, -1, self.hidden)
        return self.out(concat)


class TFF(nn.Module):
    def __init__(self, flag, d_ff=2048):
        super().__init__()
        size = E_W if flag == "e" else D_W
        self.linear_1 = nn.Linear(size, d_ff)
        self.linear_2 = nn.Linear(d_ff, size)

    def forward(self, x):
        return self.linear_2(TF.relu(self.linear_1(x)))


class TNorm(nn.Module):
    def __init__(self, flag, eps=1e-6):
        super().__init__()
        size = E_W if flag == "e" else D_W
        self.alpha = nn.Parameter(torch.ones(size))
        self.bias = nn.Parameter(torch.zeros(size))
        self.eps = eps

    def forward(self, x):
        return (self.alpha * (x - x.mean(dim=-1, keepdim=True))
                / (x.std(dim=-1, keepdim=True) + self.eps) + self.bias)


def make_pe(d_model, max_len=80):
    pe = torch.zeros(max_len, d_model)
    for pos in range(max_len):
        for i in range(0, d_model, 2):
            pe[pos, i] = math.sin(pos / (10000 ** ((2 * i) / d_model)))
            pe[pos, i + 1] = math.cos(pos / (10000 ** ((2 * (i + 1)) / d_model)))
    return pe.unsqueeze(0)


class TEncLayer(nn.Module):
    def __init__(self, hidden, heads, flag):
        super().__init__()
        self.norm_1, self.norm_2 = TNorm(flag), TNorm(flag)
        self.attn, self.ff = TMHA(heads, hidden, flag), TFF(flag)

    def forward(self, x, mask):
        x2 = self.norm_1(x)
        x = x + self.attn(x2, x2, x2, mask)
        x2 = self.norm_2(x)
        return x + self.ff(x2)


class TDecLayer(nn.Module):
    def __init__(self, hidden, heads, flag):
        super().__init__()
        self.norm_1, self.norm_2, self.norm_3 = (TNorm(flag), TNorm(flag),
                                                 TNorm(flag))
        self.attn_1 = TMHA(heads, hidden, flag)
        self.attn_2 = TMHA(heads, hidden, "ed")
        self.ff = TFF(flag)

    def forward(self, x, e_outputs, src_mask, trg_mask):
        x = x + self.attn_1(self.norm_1(x), self.norm_1(x), self.norm_1(x),
                            trg_mask)
        x2 = self.norm_2(x)
        x = x + self.attn_2(x2, e_outputs, e_outputs, src_mask)
        x2 = self.norm_3(x)
        return x + self.ff(x2)


class TTransformer(nn.Module):
    """state_dict-compatible skeleton of the reference Transformer (eval-mode
    math; dropout omitted — it is identity in eval)."""

    def __init__(self, vocab, heads=2, n=2, hidden=8):
        super().__init__()
        self.n, self.heads = n, heads

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.pe = nn.Module()
                self.pe.register_buffer("pe", make_pe(E_W))
                self.layers = nn.ModuleList(
                    [TEncLayer(hidden, heads, "e") for _ in range(n)])
                self.norm = TNorm("e")

        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                self.embedding = nn.Embedding(vocab, D_W)
                self.pe = nn.Module()
                self.pe.register_buffer("pe", make_pe(D_W))
                self.layers = nn.ModuleList(
                    [TDecLayer(hidden, heads, "d") for _ in range(n)])
                self.norm = TNorm("d")
                self.norm_out = TNorm("d")
                self.pred_linear = nn.Sequential(nn.Dropout(0.0),
                                                 nn.Linear(D_W, vocab))

        self.encoder = Enc()
        self.decoder = Dec()

    def encode(self, vid, mask):
        x = vid * math.sqrt(vid.shape[1]) + self.encoder.pe.pe[:, :vid.shape[1]]
        for layer in self.encoder.layers:
            x = layer(x, mask)
        return self.encoder.norm(x)

    def decode_train(self, e_out, s, src_mask, trg_mask):
        x = self.decoder.embedding(s)
        x = x * math.sqrt(x.shape[1]) + self.decoder.pe.pe[:, :x.shape[1]]
        for layer in self.decoder.layers:
            x = layer(x, e_out, src_mask, trg_mask)
        return self.decoder.pred_linear(self.decoder.norm_out(x))

    def decode_greedy(self, e_out, src_mask, max_len, sos_id):
        b = e_out.shape[0]
        outputs = torch.zeros(b, max_len, dtype=torch.long)
        outputs[:, 0] = sos_id
        toks = []
        for i in range(1, max_len + 1):
            x = self.decoder.embedding(outputs[:, :i])
            x = x * math.sqrt(float(i)) + self.decoder.pe.pe[:, :i]
            trg = (torch.from_numpy(
                np.triu(np.ones((1, i, i)), k=1).astype("uint8")) == 0)
            trg = trg.unsqueeze(1)
            for layer in self.decoder.layers:
                x = layer(x, e_out, src_mask, trg)
            outs = self.decoder.pred_linear(self.decoder.norm_out(x))[:, i - 1]
            nxt = torch.argmax(outs, dim=1)
            toks.append(nxt.numpy().copy())
            if i < max_len:
                outputs[:, i] = nxt
        return np.stack(toks, axis=1)


def test_transformer_full_parity(tiny_vocab, rng):
    # model widths follow the spec (vid_feat_size=E_W, embed_size=D_W) — no
    # width-table patching needed since transformer._width is spec-derived
    spec = base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=E_W,
        max_len=5, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2)
    tm = TTransformer(spec.vocab_size, heads=2, n=2, hidden=8).eval()
    params = convert.convert_transformer(tm.state_dict(), spec)

    b = 2
    vid = rng.standard_normal((b, spec.num_frames, E_W)).astype(np.float32)
    s = rng.integers(0, spec.vocab_size, (b, spec.max_len)).astype(np.int64)
    s_len = np.array([3, 5])

    with torch.no_grad():
        t_src = torch.ones(b, 1, spec.num_frames)
        t_eout = tm.encode(torch.tensor(vid), t_src.unsqueeze(1))
        # train-mode decoder (dropout=0): unshifted input, length∧causal mask
        length = (torch.arange(spec.max_len).expand(b, -1)
                  < torch.tensor(s_len).unsqueeze(1))
        nopeak = (torch.from_numpy(
            np.triu(np.ones((1, spec.max_len, spec.max_len)), k=1)
            .astype("uint8")) == 0)
        trg = (length.unsqueeze(1) & nopeak).unsqueeze(1)
        t_logits = tm.decode_train(t_eout, torch.tensor(s), t_src.unsqueeze(1), trg)
        t_tokens = tm.decode_greedy(t_eout, t_src.unsqueeze(1), spec.max_len,
                                    spec.sos_id)

    src_mask = tr.create_masks_inp(jnp.asarray(vid))
    j_eout = tr.encode(params, spec, jnp.asarray(vid), src_mask,
                       jax.random.PRNGKey(0), train=False)
    np.testing.assert_allclose(np.asarray(j_eout), t_eout.numpy(), atol=2e-4)

    trg_mask = tr.create_masks_trg(jnp.asarray(s.astype(np.int32)),
                                   jnp.asarray(s_len))
    j_logits = tr.decode_train(params, spec, j_eout, jnp.asarray(s.astype(np.int32)),
                               src_mask, trg_mask, jax.random.PRNGKey(0),
                               train=False)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), atol=2e-3)

    j_greedy = np.asarray(jnp.argmax(
        tr.apply(params, spec, jnp.asarray(vid), train=False), axis=-1))
    np.testing.assert_array_equal(j_greedy, t_tokens)


@pytest.mark.skipif(not os.environ.get("VCR_SLOW_TESTS"),
                    reason="real-width parity is slow; set VCR_SLOW_TESTS=1")
def test_transformer_full_parity_real_widths(tiny_vocab, rng):
    """Full-stack parity at the REFERENCE widths — encoder 4096, decoder 300,
    hidden 512, 6 layers, 8 heads (TransformerNet.py:21-34,95-97) — with NO
    width patching on the vcr_tpu side. Greedy tokens must match exactly."""
    global E_W, D_W
    orig = (E_W, D_W)
    try:
        E_W, D_W = 4096, 300
        vec300 = np.repeat(tiny_vocab.vectors, 19, axis=1)[:, :300] \
            .astype(np.float32)

        class Voc:  # 300-d stand-in vocab (embed width is structural)
            vocab_size = tiny_vocab.vocab_size
            embed_size = 300
            sos_id = tiny_vocab.sos_id
            vectors = vec300

        spec = base.ModelSpec(
            arch="transformer", vocab_size=Voc.vocab_size, embed_size=300,
            hidden_size=512, vid_feat_size=4096, max_len=5, num_frames=4,
            dropout_p=0.0, sos_id=Voc.sos_id, compute_dtype="float32",
            tf_layers=6, tf_heads=8)
        tm = TTransformer(spec.vocab_size, heads=8, n=6, hidden=512).eval()
        params = convert.convert_transformer(tm.state_dict(), spec)

        b = 2
        vid = rng.standard_normal((b, spec.num_frames, 4096)).astype(np.float32)
        with torch.no_grad():
            t_src = torch.ones(b, 1, spec.num_frames).unsqueeze(1)
            t_eout = tm.encode(torch.tensor(vid), t_src)
            t_tokens = tm.decode_greedy(t_eout, t_src, spec.max_len,
                                        spec.sos_id)

        src_mask = tr.create_masks_inp(jnp.asarray(vid))
        j_eout = tr.encode(params, spec, jnp.asarray(vid), src_mask,
                           jax.random.PRNGKey(0), train=False)
        np.testing.assert_allclose(np.asarray(j_eout), t_eout.numpy(),
                                   rtol=2e-4, atol=2e-3)
        j_greedy = np.asarray(jnp.argmax(
            tr.apply(params, spec, jnp.asarray(vid), train=False), axis=-1))
        np.testing.assert_array_equal(j_greedy, t_tokens)
    finally:
        E_W, D_W = orig
