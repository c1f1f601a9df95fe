"""Torch-checkpoint conversion + token-for-token decode parity.

Builds torch modules with the reference's exact structure/naming (state_dict
compatible), converts them via vcr_tpu.convert, and checks greedy decode
token parity between a torch reimplementation of the reference eval loop and
our jitted scan decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu import convert
from vcr_tpu.models import base, rationale, s2vt, s2vt_att, spatial

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402


def make_spec(vocab, arch="s2vt", **kw):
    d = dict(arch=arch, vocab_size=vocab.vocab_size, embed_size=vocab.embed_size,
             hidden_size=8, vid_feat_size=12, max_len=6, num_frames=4,
             dropout_p=0.0, sos_id=vocab.sos_id, compute_dtype="float32")
    d.update(kw)
    return base.ModelSpec(**d)


class TorchS2VT(nn.Module):
    """state_dict-compatible skeleton of the reference S2VTModel
    (S2VTModel.py:37-49)."""

    def __init__(self, vocab_size, embed_size, hidden, vid_feat):
        super().__init__()
        self.embedding = nn.Sequential(nn.Embedding(vocab_size, embed_size),
                                       nn.Dropout(0.0))
        self.rnn1 = nn.GRU(vid_feat, hidden)
        self.rnn2 = nn.GRU(hidden + embed_size, hidden)
        self.linear = nn.Sequential(nn.Dropout(0.0), nn.Linear(hidden, vocab_size))


def torch_s2vt_greedy(m: TorchS2VT, vid_feats, max_len, sos_id, vid_feat_size,
                      embed_size):
    """The reference eval decode loop (S2VTModel.py:148-177), reimplemented."""
    with torch.no_grad():
        x = vid_feats.transpose(0, 1)                       # N x B x V
        out1, state1 = m.rnn1(x)
        b = vid_feats.shape[0]
        pad = torch.zeros(out1.shape[0], b, embed_size)
        _, state2 = m.rnn2(torch.cat([out1, pad], dim=2))
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


def test_s2vt_token_parity(tiny_vocab, rng):
    spec = make_spec(tiny_vocab)
    tm = TorchS2VT(spec.vocab_size, spec.embed_size, spec.hidden_size,
                   spec.vid_feat_size)
    params = convert.convert_s2vt(tm.state_dict(), spec)

    vid = rng.standard_normal((3, spec.num_frames, spec.vid_feat_size)) \
        .astype(np.float32)
    want = torch_s2vt_greedy(tm, torch.tensor(vid), spec.max_len, spec.sos_id,
                             spec.vid_feat_size, spec.embed_size)
    logits = s2vt.apply(params, spec, jnp.asarray(vid), train=False)
    got = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(got, want)


class TorchAttention(nn.Module):
    def __init__(self, hidden):
        super().__init__()
        self.key_layer = nn.Linear(hidden, hidden, bias=False)
        self.query_layer = nn.Linear(hidden, hidden, bias=False)
        self.energy_layer = nn.Linear(hidden, 1, bias=False)

    def forward(self, query, proj_key, key):
        q = self.query_layer(query)
        energy = torch.tanh(q.unsqueeze(1) + proj_key)
        scores = self.energy_layer(energy).squeeze(-1)
        alphas = TF.softmax(scores, dim=1)
        return torch.bmm(alphas.unsqueeze(1), key).squeeze(1)


class TorchS2VTAtt(nn.Module):
    """state_dict-compatible skeleton of the reference S2VTAttModel."""

    def __init__(self, vocab_size, embed_size, hidden, vid_feat):
        super().__init__()

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.rnn = nn.GRU(vid_feat, hidden)

        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                self.embedding = nn.Embedding(vocab_size, embed_size)
                self.rnn = nn.GRU(hidden + embed_size, hidden)
                self.attention = TorchAttention(hidden)
                self.pred_linear = nn.Sequential(nn.Dropout(0.0),
                                                 nn.Linear(hidden, vocab_size))

        self.encoder = Enc()
        self.decoder = Dec()


def torch_s2vt_att_greedy(m: TorchS2VTAtt, vid_feats, max_len, sos_id):
    """Reference eval loop (S2VTAttModel.py:150-196), reimplemented."""
    with torch.no_grad():
        enc_outs, enc_final = m.encoder.rnn(vid_feats.transpose(0, 1))
        enc_outs = enc_outs.transpose(0, 1).contiguous()    # B x N x H
        b, n, h = enc_outs.shape
        proj_key = m.decoder.attention.key_layer(
            enc_outs.view(b * n, -1)).view(b, n, -1)
        state = enc_final
        words = torch.full((b,), sos_id, dtype=torch.long)
        toks = []
        for _ in range(max_len):
            ctx = m.decoder.attention(state.squeeze(0), proj_key, enc_outs)
            emb = m.decoder.embedding(words)
            inp = torch.cat([ctx, emb], dim=1).unsqueeze(0)
            out, state = m.decoder.rnn(inp, state)
            logits = m.decoder.pred_linear(out.squeeze(0))
            words = torch.argmax(logits, dim=1)
            toks.append(words.numpy().copy())
    return np.stack(toks, axis=1)


def test_s2vt_att_token_parity(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, arch="s2vt-att")
    tm = TorchS2VTAtt(spec.vocab_size, spec.embed_size, spec.hidden_size,
                      spec.vid_feat_size)
    params = convert.convert_s2vt_att(tm.state_dict(), spec)

    vid = rng.standard_normal((3, spec.num_frames, spec.vid_feat_size)) \
        .astype(np.float32)
    want = torch_s2vt_att_greedy(tm, torch.tensor(vid), spec.max_len, spec.sos_id)
    logits = s2vt_att.apply(params, spec, jnp.asarray(vid), train=False)
    got = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(got, want)


def test_detect_arch(tiny_vocab):
    spec = make_spec(tiny_vocab)
    tm = TorchS2VT(spec.vocab_size, spec.embed_size, spec.hidden_size,
                   spec.vid_feat_size)
    assert convert.detect_arch(tm.state_dict()) == "s2vt"
    ta = TorchS2VTAtt(spec.vocab_size, spec.embed_size, spec.hidden_size,
                      spec.vid_feat_size)
    assert convert.detect_arch(ta.state_dict()) == "s2vt-att"
    # wrapped families
    sd = {"caption_net." + k: v for k, v in tm.state_dict().items()}
    sd["gen.rnn.weight_ih_l0"] = torch.zeros(1)
    assert convert.detect_arch(sd) == "rationale"
    sd2 = {"caption_net." + k: v for k, v in tm.state_dict().items()}
    sd2["conv.0.weight"] = torch.zeros(1)
    assert convert.detect_arch(sd2) == "spatial"


def test_export_roundtrip(tiny_vocab, rng):
    """params -> reference state_dict -> params round-trips exactly, and the
    exported dict loads into a torch module with the reference layout."""
    spec = make_spec(tiny_vocab)
    import vcr_tpu.models.s2vt as s2vt_mod

    params = s2vt_mod.init_params(jax.random.PRNGKey(5), spec, tiny_vocab.vectors)
    sd = convert.export_s2vt(params, spec)
    back = convert.convert_s2vt(sd, spec)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    tm = TorchS2VT(spec.vocab_size, spec.embed_size, spec.hidden_size,
                   spec.vid_feat_size)
    tm.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})  # layout OK

    # s2vt-att too
    spec_att = make_spec(tiny_vocab, arch="s2vt-att")
    import vcr_tpu.models.s2vt_att as att_mod

    p_att = att_mod.init_params(jax.random.PRNGKey(6), spec_att,
                                tiny_vocab.vectors)
    sd_att = convert.export_s2vt_att(p_att, spec_att)
    back_att = convert.convert_s2vt_att(sd_att, spec_att)
    for a, b in zip(jax.tree_util.tree_leaves(p_att),
                    jax.tree_util.tree_leaves(back_att)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    tma = TorchS2VTAtt(spec_att.vocab_size, spec_att.embed_size,
                       spec_att.hidden_size, spec_att.vid_feat_size)
    tma.load_state_dict({k: torch.tensor(v) for k, v in sd_att.items()})


def test_rationale_and_spatial_conversion_run(tiny_vocab, rng):
    spec = make_spec(tiny_vocab, arch="rationale", base_arch="s2vt", tau=1.0)
    sd = {}
    cap = TorchS2VT(spec.vocab_size, spec.embed_size, spec.hidden_size,
                    spec.vid_feat_size)
    for k, v in cap.state_dict().items():
        sd["caption_net." + k] = v
    gen_rnn = nn.LSTM(spec.vid_feat_size, spec.hidden_size, bidirectional=True)
    for k, v in gen_rnn.state_dict().items():
        sd["gen.rnn." + k] = v
    gen_lin = nn.Linear(2 * spec.hidden_size, 2)
    for k, v in gen_lin.state_dict().items():
        sd["gen.linear." + k] = v
    params = convert.convert_rationale(sd, spec)
    vid = jnp.asarray(rng.standard_normal((2, spec.num_frames, spec.vid_feat_size)),
                      dtype=jnp.float32)
    logits, probs = rationale.apply(params, spec, vid, train=False)
    assert logits.shape == (2, spec.max_len, spec.vocab_size)

    # spatial
    spec_sp = make_spec(tiny_vocab, arch="spatial", base_arch="s2vt",
                        vid_feat_size=6)
    sd2 = {}
    cap2 = TorchS2VT(spec_sp.vocab_size, spec_sp.embed_size, spec_sp.hidden_size,
                     spec_sp.vid_feat_size)
    for k, v in cap2.state_dict().items():
        sd2["caption_net." + k] = v
    conv = nn.Sequential(
        nn.Conv2d(spec_sp.vid_feat_size, spec_sp.hidden_size, 3, 1, 1),
        nn.BatchNorm2d(spec_sp.hidden_size), nn.ReLU(),
        nn.Conv2d(spec_sp.hidden_size, spec_sp.hidden_size, 3, 1, 1),
        nn.BatchNorm2d(spec_sp.hidden_size), nn.ReLU())
    for k, v in conv.state_dict().items():
        sd2["conv." + k] = v
    att = TorchAttention(spec_sp.hidden_size)
    for k, v in att.state_dict().items():
        sd2["attention." + k] = v
    params_sp = convert.convert_spatial(sd2, spec_sp)
    vid_sp = jnp.asarray(rng.standard_normal((2, spec_sp.num_frames,
                                              spec_sp.vid_feat_size, 4, 4)),
                         dtype=jnp.float32)
    logits_sp, alphas, _ = spatial.apply(params_sp, spec_sp, vid_sp, train=False)
    assert logits_sp.shape == (2, spec_sp.max_len, spec_sp.vocab_size)
    assert alphas.shape == (2, spec_sp.num_frames, 4, 4)


def test_export_roundtrip_transformer_rationale_spatial(tiny_vocab, rng):
    """Inverse converters for the remaining three families: params ->
    reference state_dict -> params round-trips exactly, and each exported
    dict strict-loads into the reference-layout torch skeleton."""
    import test_convert_spatial_rationale as tsr
    import test_convert_transformer as tct
    import vcr_tpu.models.rationale as rationale_mod
    import vcr_tpu.models.spatial as spatial_mod
    import vcr_tpu.models.transformer as transformer_mod

    def roundtrip(arch, module, spec, torch_model):
        params = module.init_params(jax.random.PRNGKey(7), spec,
                                    tiny_vocab.vectors)
        sd = convert.export_state_dict(params, spec, arch)
        back = convert.convert_state_dict(sd, spec, arch)
        fa = jax.tree_util.tree_flatten_with_path(params)[0]
        fb = jax.tree_util.tree_flatten_with_path(back)[0]
        assert [p for p, _ in fa] == [p for p, _ in fb]
        for (path, a), (_, b) in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=0,
                err_msg=f"{arch}: {jax.tree_util.keystr(path)}")
        torch_model.load_state_dict(
            {k: torch.tensor(v) for k, v in sd.items()})  # layout OK (strict)

    spec_tr = base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=12,
        max_len=5, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32", tf_layers=2, tf_heads=2)
    roundtrip("transformer", transformer_mod, spec_tr,
              tct.TTransformer(spec_tr.vocab_size, heads=2, n=2, hidden=8))

    spec_r = make_spec(tiny_vocab, arch="rationale", base_arch="s2vt", tau=1.0)
    roundtrip("rationale", rationale_mod, spec_r,
              tsr.TorchRationale(spec_r.vocab_size, spec_r.embed_size,
                                 spec_r.hidden_size, spec_r.vid_feat_size))

    spec_sp = make_spec(tiny_vocab, arch="spatial", base_arch="s2vt",
                        vid_feat_size=6)
    roundtrip("spatial", spatial_mod, spec_sp,
              tsr.TorchSpatial(spec_sp.vocab_size, spec_sp.embed_size,
                               spec_sp.hidden_size, spec_sp.vid_feat_size))
