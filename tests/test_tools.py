"""verify_parity tool: a synthetic reference .net checkpoint round-trips
through conversion and decodes the val split."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_decode_corpus_tool(tmp_path):
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.tools import decode_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    cfg = tiny_config(tmp, epochs=1)
    train(cfg)

    out_file = os.path.join(tmp, "caps.json")
    results = decode_corpus(cfg, out_file=out_file)
    assert os.path.exists(out_file)
    assert len(results) >= 2
    assert all(isinstance(r["caption"], str) for r in results)

    # beam decode agrees with greedy prefixes on beam_size=1 path equivalence
    results_beam = decode_corpus(cfg, beam_size=2)
    assert len(results_beam) == len(results)


def test_verify_parity_tool(tmp_path, tiny_vocab):
    from tests.test_convert import TorchS2VT, torch_s2vt_greedy
    from tests.util_corpus import build_corpus
    from vcr_tpu.config import Config
    from vcr_tpu.tools import verify_parity

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"), num_frames=4, feat_dim=12,
                 glove_dim=16)

    cfg = Config(data_dir=os.path.join(tmp, "data"), corpus="msvd_vgg",
                 arch="s2vt", glove_emb_file="glove_tiny.txt", num_frames=4,
                 vid_feat_size=12, max_len=6, hidden_size=8, bsize=4,
                 compute_dtype="float32", seed=123)

    # a "reference" checkpoint: torch model with the reference's layout
    from vcr_tpu.vocab import Vocab

    vocab = Vocab(os.path.join(tmp, "data", "msvd_vgg", "glove",
                               "glove_tiny.txt"), seed=cfg.seed)
    tm = TorchS2VT(vocab.vocab_size, vocab.embed_size, cfg.hidden_size,
                   cfg.vid_feat_size)
    ckpt = os.path.join(tmp, "model_best.net")
    torch.save({"state_dict": tm.state_dict(), "epoch": 3, "n_iter": 42}, ckpt)

    out_file = os.path.join(tmp, "parity.json")
    results = verify_parity(cfg, ckpt, out_file)
    assert os.path.exists(out_file)
    assert len(results) >= 2
    assert all("caption" in r and "vid_key" in r for r in results)

    # token-for-token vs the torch reimplementation of the reference decode
    from vcr_tpu.data.pipeline import CaptionDataset

    ds = CaptionDataset(os.path.join(tmp, "data"), "msvd_vgg", "val", vocab,
                        cfg.num_frames, cfg.max_len)
    feats = np.stack([ds.load_features(i) for i in range(len(ds))])
    want = torch_s2vt_greedy(tm, torch.tensor(feats), cfg.max_len,
                             vocab.sos_id, cfg.vid_feat_size, vocab.embed_size)
    got = np.asarray([r["tokens"] for r in results])
    np.testing.assert_array_equal(got, want)


def test_decode_corpus_mesh_equals_single_device(tmp_path):
    """SPMD batch decode: a (dp=4, mp=2) mesh over the 8 virtual CPU devices
    produces token-for-token the single-device greedy decode (corpus rows are
    padded to a dp multiple and the padding dropped)."""
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.tools import decode_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    cfg = tiny_config(tmp, epochs=1)
    train(cfg)

    single = decode_corpus(cfg)
    meshed = decode_corpus(cfg.replace(mesh_dp=4, mesh_mp=2))
    assert [r["vid_key"] for r in meshed] == [r["vid_key"] for r in single]
    for a, b in zip(meshed, single):
        assert a["tokens"] == b["tokens"]


def test_decode_corpus_chunked_equals_one_shot(tmp_path):
    """--bsize smaller than the corpus => several fixed-shape chunks through
    ONE compiled program (large-corpus memory bound); tokens identical to the
    single-chunk decode, greedy and beam, incl. a dp mesh with a padded final
    chunk."""
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.tools import decode_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    cfg = tiny_config(tmp, epochs=1)
    train(cfg)

    one = decode_corpus(cfg)                       # bsize >= corpus: 1 chunk
    assert len(one) >= 3
    small = decode_corpus(cfg.replace(bsize=2))    # 2 chunks, final padded
    assert [r["tokens"] for r in small] == [r["tokens"] for r in one]

    one_beam = decode_corpus(cfg, beam_size=2)
    small_beam = decode_corpus(cfg.replace(bsize=2), beam_size=2)
    assert [r["tokens"] for r in small_beam] == [r["tokens"] for r in one_beam]

    meshed = decode_corpus(cfg.replace(bsize=2, mesh_dp=4))  # chunk pads 2->4
    assert [r["tokens"] for r in meshed] == [r["tokens"] for r in one]


def test_export_reference_checkpoint_roundtrip(tmp_path, tiny_vocab):
    """CLI-level inverse conversion: a vcr_tpu training checkpoint exports to
    a reference-format .net blob that torch.loads, strict-loads into the
    reference-layout module, and reimports with identical greedy tokens."""
    import jax
    import jax.numpy as jnp

    from tests.test_convert import TorchS2VT, torch_s2vt_greedy
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu import convert
    from vcr_tpu.models import base, s2vt
    from vcr_tpu.tools import export_reference_checkpoint
    from vcr_tpu.train.loop import train
    from vcr_tpu.vocab import Vocab

    tmp = str(tmp_path)
    glove = build_corpus(os.path.join(tmp, "data"))
    cfg = tiny_config(tmp, epochs=1)
    train(cfg)

    out = export_reference_checkpoint(cfg)
    blob = torch.load(out, map_location="cpu", weights_only=False)
    assert {"epoch", "state_dict", "n_iter", "opts",
            "val_meteor_score", "best_val_meteor_score"} <= set(blob)

    vocab = Vocab(glove)
    spec = base.ModelSpec(
        arch="s2vt", vocab_size=vocab.vocab_size, embed_size=vocab.embed_size,
        hidden_size=blob["opts"].hidden_size,
        vid_feat_size=blob["opts"].vid_feat_size,
        max_len=blob["opts"].max_len, num_frames=blob["opts"].num_frames,
        dropout_p=0.0, sos_id=vocab.sos_id, compute_dtype="float32")
    tm = TorchS2VT(spec.vocab_size, spec.embed_size, spec.hidden_size,
                   spec.vid_feat_size).eval()
    tm.load_state_dict(blob["state_dict"])  # strict

    rng = np.random.default_rng(0)
    vid = rng.standard_normal(
        (2, spec.num_frames, spec.vid_feat_size)).astype(np.float32)
    t_tokens = torch_s2vt_greedy(tm, torch.tensor(vid), spec.max_len,
                                 spec.sos_id, spec.vid_feat_size,
                                 spec.embed_size)
    params = convert.convert_s2vt(
        {k: v for k, v in blob["state_dict"].items()}, spec)
    logits = s2vt.apply(params, spec, jnp.asarray(vid), train=False)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)), t_tokens)


def test_verify_parity_tool_wrapped_family(tmp_path, tiny_vocab):
    """A RationaleNet .net checkpoint (wrapped family) must be auto-detected
    from its state-dict keys and decoded with the rationale module even
    though --arch names the BASE captioner (reference --arch semantics)."""
    from tests.test_convert_spatial_rationale import TorchRationale
    from tests.util_corpus import build_corpus
    from vcr_tpu.config import Config
    from vcr_tpu.tools import verify_parity

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"), num_frames=4, feat_dim=12,
                 glove_dim=16)
    cfg = Config(data_dir=os.path.join(tmp, "data"), corpus="msvd_vgg",
                 arch="s2vt", glove_emb_file="glove_tiny.txt", num_frames=4,
                 vid_feat_size=12, max_len=6, hidden_size=8, bsize=4,
                 compute_dtype="float32", seed=123, tau=1.0)

    from vcr_tpu.vocab import Vocab

    vocab = Vocab(os.path.join(tmp, "data", "msvd_vgg", "glove",
                               "glove_tiny.txt"), seed=cfg.seed)
    tm = TorchRationale(vocab.vocab_size, vocab.embed_size, cfg.hidden_size,
                        cfg.vid_feat_size).eval()
    ckpt = os.path.join(tmp, "model_best.net")
    torch.save({"state_dict": tm.state_dict(), "epoch": 1, "n_iter": 7}, ckpt)

    results = verify_parity(cfg, ckpt)
    assert len(results) >= 2
    # tokens come from the rationale module (hard gumbel w/ its own key), so
    # just pin shape/validity here; full shared-noise token parity is covered
    # by test_convert_spatial_rationale.py
    assert all(len(r["tokens"]) == cfg.max_len for r in results)


def test_decode_corpus_wrapped_family_checkpoint(tmp_path):
    """Regression: --mode decode on a train_rationale checkpoint must
    dispatch the rationale module (the adopted config's arch names the BASE
    captioner — previously this KeyError'd on the wrapped param tree) across
    the greedy, beam, and sampled paths."""
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.tools import decode_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    cfg = tiny_config(tmp, mode="train_rationale", epochs=1, tau=1.0)
    train(cfg)

    greedy = decode_corpus(cfg)
    assert len(greedy) >= 2 and all(len(r["tokens"]) == cfg.max_len
                                    for r in greedy)
    beam = decode_corpus(cfg, beam_size=2)
    assert len(beam) == len(greedy)
    sampled = decode_corpus(cfg.replace(sample_temperature=1.3,
                                        sample_top_k=3))
    assert len(sampled) == len(greedy)
