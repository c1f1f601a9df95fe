"""Deployable serving artifacts (vcr_tpu/export_serving.py): StableHLO
export + weights + metadata, loadable WITHOUT the framework's model code.

The reference has no deployment/serving surface at all (SURVEY §3.5) — these
tests pin the beyond-reference contract: token-identical replay vs the live
serving graph, a symbolic batch dimension (one artifact, any batch), and
framework-free loading in a fresh process.
"""

import json
import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu import export_serving
from vcr_tpu.models import base, s2vt
from vcr_tpu.serving import build_captioner


def _s2vt_spec(tiny_vocab, **kw):
    defaults = dict(arch="s2vt", vocab_size=tiny_vocab.vocab_size,
                    embed_size=tiny_vocab.embed_size, hidden_size=8,
                    vid_feat_size=12, max_len=5, num_frames=4, dropout_p=0.0,
                    sos_id=tiny_vocab.sos_id, compute_dtype="float32")
    defaults.update(kw)
    return base.ModelSpec(**defaults)


def test_export_s2vt_symbolic_batch(tmp_path, tiny_vocab, rng):
    """One artifact serves ANY batch size (symbolic dim), token-identical to
    the live captioner."""
    spec = _s2vt_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    out = export_serving.export_captioner(params, spec, str(tmp_path / "art"),
                                          vocab=tiny_vocab)
    art = export_serving.load_artifact(out)
    live = build_captioner(params, spec, "none", vocab=tiny_vocab)
    for b in (1, 2, 5):
        feats = rng.standard_normal((b, 4, 12)).astype(np.float32)
        np.testing.assert_array_equal(
            art.caption(feats), np.asarray(live(jnp.asarray(feats))))
    assert art.meta["batch"] == "symbolic"
    assert art.meta["eos_id"] == tiny_vocab.eos_id
    for f in (export_serving.GRAPH_FILE, export_serving.WEIGHTS_FILE,
              export_serving.META_FILE):
        assert os.path.exists(os.path.join(out, f))


def test_export_transformer_beam_and_greedy(tmp_path, tiny_vocab, rng):
    """The KV-cached fast greedy AND the lineage fast beam both survive
    export with a symbolic batch."""
    import vcr_tpu.models.transformer as tr

    spec = _s2vt_spec(tiny_vocab, arch="transformer", tf_layers=2, tf_heads=2)
    params = tr.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    feats = rng.standard_normal((3, 4, 12)).astype(np.float32)
    for beam in (1, 2):
        out = export_serving.export_captioner(
            params, spec, str(tmp_path / f"art_b{beam}"), beam_size=beam,
            vocab=tiny_vocab)
        art = export_serving.load_artifact(out)
        live = build_captioner(params, spec, "none", beam_size=beam,
                               vocab=tiny_vocab)
        np.testing.assert_array_equal(
            art.caption(feats), np.asarray(live(jnp.asarray(feats))))


def test_export_rationale_and_spatial(tmp_path, tiny_vocab, rng):
    from vcr_tpu.models import rationale, spatial

    spec = _s2vt_spec(tiny_vocab, arch="rationale", base_arch="s2vt", tau=1.0)
    params = rationale.init_params(jax.random.PRNGKey(0), spec,
                                   tiny_vocab.vectors)
    key = jax.random.PRNGKey(7)
    out = export_serving.export_captioner(params, spec,
                                          str(tmp_path / "rat"), rng=key,
                                          vocab=tiny_vocab)
    art = export_serving.load_artifact(out)
    live = build_captioner(params, spec, "none", rng=key, vocab=tiny_vocab)
    feats = rng.standard_normal((2, 4, 12)).astype(np.float32)
    np.testing.assert_array_equal(art.caption(feats),
                                  np.asarray(live(jnp.asarray(feats))))

    spec_sp = _s2vt_spec(tiny_vocab, arch="spatial", base_arch="s2vt",
                         vid_feat_size=6, num_frames=3, grid_size=4)
    params_sp = spatial.init_params(jax.random.PRNGKey(1), spec_sp,
                                    tiny_vocab.vectors)
    out = export_serving.export_captioner(params_sp, spec_sp,
                                          str(tmp_path / "sp"),
                                          vocab=tiny_vocab)
    art = export_serving.load_artifact(out)
    # grid input signature (B, N, F, K, K) recorded in meta
    assert art.meta["input_item_shape"] == [3, 6, 4, 4]
    live = build_captioner(params_sp, spec_sp, "none", vocab=tiny_vocab)
    grid = rng.standard_normal((2, 3, 6, 4, 4)).astype(np.float32)
    np.testing.assert_array_equal(art.caption(grid),
                                  np.asarray(live(jnp.asarray(grid))))


def test_export_sampled_and_s2vt_beam(tmp_path, tiny_vocab, rng):
    """The two remaining decode styles survive export: temperature/top-k
    sampling (fixed rng => deterministic per input) and the generic
    fold-beams-into-batch beam search (non-transformer path)."""
    spec = _s2vt_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    feats = rng.standard_normal((2, 4, 12)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    out = export_serving.export_captioner(
        params, spec, str(tmp_path / "sampled"), vocab=tiny_vocab, rng=key,
        sample_temperature=0.8, sample_top_k=3)
    art = export_serving.load_artifact(out)
    live = build_captioner(params, spec, "none", vocab=tiny_vocab, rng=key,
                           sample_temperature=0.8, sample_top_k=3)
    np.testing.assert_array_equal(art.caption(feats),
                                  np.asarray(live(jnp.asarray(feats))))

    out = export_serving.export_captioner(
        params, spec, str(tmp_path / "beam"), vocab=tiny_vocab, beam_size=3)
    art = export_serving.load_artifact(out)
    live = build_captioner(params, spec, "none", vocab=tiny_vocab,
                           beam_size=3)
    np.testing.assert_array_equal(art.caption(feats),
                                  np.asarray(live(jnp.asarray(feats))))


def test_export_fused_resnet_featurizer(tmp_path, tiny_vocab, rng):
    """A fused-backbone export: the resnet weights ride in the artifact's
    leaf list and the whole frames->features->tokens graph replays."""
    from vcr_tpu.models import resnet

    spec = _s2vt_spec(tiny_vocab, vid_feat_size=512, num_frames=2)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    feat_params = resnet.init_params(jax.random.PRNGKey(1), "resnet18")
    out = export_serving.export_captioner(
        params, spec, str(tmp_path / "art"), featurizer="resnet",
        feat_params=feat_params, vocab=tiny_vocab, image_size=64)
    art = export_serving.load_artifact(out)
    assert art.meta["input_item_shape"] == [2, 3, 64, 64]
    live = build_captioner(params, spec, "resnet", feat_params,
                           vocab=tiny_vocab)
    frames = rng.standard_normal((2, 2, 3, 64, 64)).astype(np.float32)
    np.testing.assert_array_equal(art.caption(frames),
                                  np.asarray(live(jnp.asarray(frames))))


def test_export_multichip_dp8(tmp_path, tiny_vocab, rng):
    """dp=8 artifact: batch sharded over the 8-device mesh (GSPMD partitions
    the exported graph), symbolic batch = any multiple of dp, token-identical
    to the single-device live captioner."""
    spec = _s2vt_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    out = export_serving.export_captioner(params, spec, str(tmp_path / "art"),
                                          vocab=tiny_vocab, dp=8)
    art = export_serving.load_artifact(out)
    assert art.meta["dp"] == 8 and art.meta["nr_devices"] == 8
    live = build_captioner(params, spec, "none", vocab=tiny_vocab)
    for b in (8, 16):
        feats = rng.standard_normal((b, 4, 12)).astype(np.float32)
        np.testing.assert_array_equal(
            art.caption(feats), np.asarray(live(jnp.asarray(feats))))
    with pytest.raises(ValueError, match="batch % dp"):
        art.caption(rng.standard_normal((4, 4, 12)).astype(np.float32))


def test_artifact_loads_without_framework(tmp_path, tiny_vocab, rng):
    """A fresh process that never imports vcr_tpu captions from the artifact
    (the deployment contract: jax + numpy only)."""
    spec = _s2vt_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    out = export_serving.export_captioner(params, spec, str(tmp_path / "art"),
                                          vocab=tiny_vocab)
    feats = rng.standard_normal((2, 4, 12)).astype(np.float32)
    np.save(tmp_path / "feats.npy", feats)

    script = textwrap.dedent("""
        import json, sys
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        from jax import export
        assert not any(m.startswith("vcr_tpu") for m in sys.modules), \\
            "framework leaked into the serving process"
        art_dir, feats_path = sys.argv[1], sys.argv[2]
        meta = json.load(open(art_dir + "/meta.json"))
        exp = export.deserialize(open(art_dir + "/serving_fn.bin", "rb").read())
        w = np.load(art_dir + "/weights.npz")
        leaves = [w[k] for k in sorted(w.files)]
        tokens = exp.call(leaves, np.load(feats_path))
        print(json.dumps(np.asarray(tokens).tolist()))
        assert not any(m.startswith("vcr_tpu") for m in sys.modules)
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, "-c", script, out,
                          str(tmp_path / "feats.npy")],
                         capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stderr
    got = np.asarray(json.loads(res.stdout.strip().splitlines()[-1]))
    live = build_captioner(params, spec, "none", vocab=tiny_vocab)
    np.testing.assert_array_equal(got, np.asarray(live(jnp.asarray(feats))))


def test_leaf_dtype_roundtrip_bfloat16(tmp_path):
    """bfloat16 leaves (not npz-portable) store as float32 and cast back —
    bf16 -> f32 -> bf16 is exact."""
    leaves = [np.arange(6, dtype=np.float32).reshape(2, 3),
              jnp.asarray([1.5, 2.25, -3.0], jnp.bfloat16)]
    path = str(tmp_path / "w.npz")
    export_serving._save_leaves(path, leaves)
    dtypes = [str(np.dtype(np.asarray(l).dtype)) for l in leaves]
    back = export_serving._load_leaves(path, dtypes)
    assert str(back[1].dtype) == "bfloat16"
    np.testing.assert_array_equal(np.asarray(back[1], np.float32),
                                  np.asarray(leaves[1], np.float32))
    np.testing.assert_array_equal(back[0], leaves[0])


def test_artifact_input_validation(tmp_path, tiny_vocab, rng):
    spec = _s2vt_spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    out = export_serving.export_captioner(params, spec, str(tmp_path / "art"),
                                          vocab=tiny_vocab)
    art = export_serving.load_artifact(out)
    with pytest.raises(ValueError, match="signature"):
        art.caption(rng.standard_normal((2, 4, 13)).astype(np.float32))
    # format version gate
    meta = json.load(open(os.path.join(out, export_serving.META_FILE)))
    meta["format_version"] = 999
    json.dump(meta, open(os.path.join(out, export_serving.META_FILE), "w"))
    with pytest.raises(ValueError, match="format_version"):
        export_serving.load_artifact(out)


def test_cli_export_serving_from_checkpoint(tmp_path):
    """--mode export_serving end-to-end: train a tiny checkpoint, export, load
    the artifact, and match --mode decode's greedy tokens."""
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.tools import export_serving_artifact, load_inference_state
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    cfg = tiny_config(tmp, epochs=1)
    train(cfg)
    out = export_serving_artifact(cfg)
    art = export_serving.load_artifact(out)
    assert set(art.meta["platforms"]) == {"cpu", "tpu"}

    cfg2, params, spec, vocab = load_inference_state(cfg)
    live = build_captioner(params, spec, "none", vocab=vocab)
    feats = np.asarray(
        np.random.default_rng(0).standard_normal(
            (2, spec.num_frames, spec.vid_feat_size)), np.float32)
    np.testing.assert_array_equal(art.caption(feats),
                                  np.asarray(live(jnp.asarray(feats))))
