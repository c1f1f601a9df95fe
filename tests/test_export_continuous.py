"""Continuous-serving artifacts (vcr_tpu/export_continuous.py).

The frozen slot pool must caption exactly like the live one — same scheduler,
same chunking, StableHLO graphs instead of jitted python — and must be
drivable with jax + numpy alone (no framework model code) in a fresh process.
"""

import json
import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from vcr_tpu import export_continuous
from vcr_tpu.models import base
from vcr_tpu.serving_continuous import ContinuousCaptioner


def _spec(tiny_vocab, arch="s2vt", **kw):
    d = dict(arch=arch, vocab_size=tiny_vocab.vocab_size,
             embed_size=tiny_vocab.embed_size, hidden_size=8,
             vid_feat_size=12, max_len=6, num_frames=4, dropout_p=0.0,
             sos_id=tiny_vocab.sos_id, compute_dtype="float32")
    d.update(kw)
    return base.ModelSpec(**d)


def _params(spec, tiny_vocab, seed=0):
    return base.build_model(spec.arch)[0](jax.random.PRNGKey(seed), spec,
                                          tiny_vocab.vectors)


@pytest.mark.parametrize("arch,kw", [
    ("s2vt", {}),
    ("transformer", dict(tf_layers=2, tf_heads=2)),
    ("rationale", dict(base_arch="s2vt", tau=1.0)),
])
def test_artifact_matches_live_pool(tmp_path, tiny_vocab, rng, arch, kw):
    spec = _spec(tiny_vocab, arch, **kw)
    params = _params(spec, tiny_vocab)
    feats = rng.standard_normal((7, 4, 12)).astype(np.float32)
    reqs = {i: feats[i] for i in range(7)}

    live = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                               step_chunk=2, eos_id=tiny_vocab.eos_id,
                               rng=jax.random.PRNGKey(5))
    want = live.caption_all(reqs)

    out = export_continuous.export_continuous(
        params, spec, str(tmp_path / "art"), slots=3, admit_chunk=2,
        step_chunk=2, eos_id=tiny_vocab.eos_id, seed=5)
    art = export_continuous.load_continuous(out)
    got = art.caption_all(reqs)
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    assert art.stats["served"] == 7


@pytest.mark.parametrize("arch,kw", [
    ("s2vt", {}),
    ("transformer", dict(tf_layers=2, tf_heads=2)),
])
def test_beam_artifact_matches_live_beam_pool(tmp_path, tiny_vocab, rng,
                                              arch, kw):
    """beam_size freezes the beam step (the transformer's lineage slot
    stepper included): the artifact's continuous beam must match the live
    beam pool token-for-token."""
    spec = _spec(tiny_vocab, arch, **kw)
    params = _params(spec, tiny_vocab, seed=7)
    feats = rng.standard_normal((5, 4, 12)).astype(np.float32)
    reqs = {i: feats[i] for i in range(5)}

    live = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                               eos_id=tiny_vocab.eos_id, beam_size=3)
    want = live.caption_all(reqs)
    out = export_continuous.export_continuous(
        params, spec, str(tmp_path / "art"), slots=2, admit_chunk=1,
        beam_size=3, eos_id=tiny_vocab.eos_id)
    got = export_continuous.load_continuous(out).caption_all(reqs)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_int8_artifact_matches_live_int8_pool(tmp_path, tiny_vocab, rng):
    """kv_cache='int8' freezes the quantized slot stepper: the artifact's
    int8 pool must match the LIVE int8 pool token-for-token (exactness here
    is export-vs-live determinism, not int8-vs-bf16)."""
    spec = _spec(tiny_vocab, "transformer", tf_layers=2, tf_heads=2)
    params = _params(spec, tiny_vocab, seed=9)
    feats = rng.standard_normal((5, 4, 12)).astype(np.float32)
    reqs = {i: feats[i] for i in range(5)}

    live = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                               step_chunk=2, eos_id=tiny_vocab.eos_id,
                               kv_cache="int8")
    want = live.caption_all(reqs)
    out = export_continuous.export_continuous(
        params, spec, str(tmp_path / "art"), slots=2, admit_chunk=1,
        step_chunk=2, eos_id=tiny_vocab.eos_id, kv_cache="int8")
    got = export_continuous.load_continuous(out).caption_all(reqs)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_artifact_behind_http_server(tmp_path, tiny_vocab, rng):
    """CaptionServer fronts a frozen artifact (same scheduler-ops protocol):
    the full deployment shape with zero model code on the host."""
    import io
    import urllib.request

    from vcr_tpu.server import CaptionServer

    spec = _spec(tiny_vocab)
    params = _params(spec, tiny_vocab, seed=2)
    out = export_continuous.export_continuous(
        params, spec, str(tmp_path / "art"), slots=2, admit_chunk=1,
        vocab=tiny_vocab)
    art = export_continuous.load_continuous(out)
    feats = rng.standard_normal((4, 12)).astype(np.float32)

    live = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                               eos_id=tiny_vocab.eos_id)
    want = live.caption_all({0: feats})[0]

    # detokenizer travels IN the artifact (meta id_to_word): vocab-free host
    with CaptionServer(art, vocab=art.vocab) as server:
        buf = io.BytesIO()
        np.save(buf, feats)
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/caption", data=buf.getvalue())
        resp = json.loads(urllib.request.urlopen(req, timeout=120).read())
    assert [int(t) for t in resp["tokens"]] == [int(t) for t in want]
    assert resp["caption"] == tiny_vocab.get_sent_from_index(want)


def test_frameworkless_replay_fresh_process(tmp_path, tiny_vocab, rng):
    """Drive the three frozen graphs from a fresh process that imports ONLY
    jax + numpy (no vcr_tpu): admit two videos, tick to completion, match the
    live pool's tokens."""
    spec = _spec(tiny_vocab)
    params = _params(spec, tiny_vocab, seed=3)
    feats = rng.standard_normal((2, 4, 12)).astype(np.float32)
    live = ContinuousCaptioner(params, spec, slots=2, admit_chunk=2,
                               step_chunk=1, eos_id=tiny_vocab.eos_id)
    want = live.caption_all({i: feats[i] for i in range(2)})

    out = export_continuous.export_continuous(
        params, spec, str(tmp_path / "art"), slots=2, admit_chunk=2,
        step_chunk=1, eos_id=tiny_vocab.eos_id)
    np.save(tmp_path / "feats.npy", feats)
    np.savez(tmp_path / "want.npz",
             **{str(k): v for k, v in want.items()})

    script = textwrap.dedent(f"""
        import json, os
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        from jax import export as jexport

        art = {str(tmp_path / "art")!r}
        meta = json.load(open(os.path.join(art, "meta.json")))
        def load(f):
            return jexport.deserialize(open(os.path.join(art, f), "rb").read())
        enc, admit, step = load("encode_fn.bin"), load("admit_fn.bin"), load("step_fn.bin")
        def leaves(fname, dtypes):
            w = np.load(os.path.join(art, fname))
            import jax.numpy as jnp
            out = []
            for k, dt in zip(sorted(w.files), dtypes):
                a = w[k]
                out.append(jnp.asarray(a).astype(dt) if str(a.dtype) != dt else a)
            return out
        W = leaves("weights.npz", meta["weight_leaf_dtypes"])
        S = leaves("state0.npz", meta["state_leaf_dtypes"])
        import jax.numpy as jnp
        feats = np.load({str(tmp_path / "feats.npy")!r})
        new = enc.call(W, jnp.asarray(feats), jnp.int32(1))
        S = list(admit.call(S, list(new), jnp.asarray([0, 1], jnp.int32),
                            jnp.asarray([True, True])))
        bk = meta["bookkeeping_leaf_indices"]
        for _ in range(meta["max_len"] + 1):
            if not np.asarray(S[bk["active"]]).any():
                break
            S = list(step.call(W, S))
        toks = np.asarray(S[bk["toks"]]); steps = np.asarray(S[bk["steps"]])
        want = np.load({str(tmp_path / "want.npz")!r})
        for i in range(2):
            got = toks[i, : steps[i]]
            assert np.array_equal(got, want[str(i)]), (i, got, want[str(i)])
        print("FRAMEWORKLESS_OK")
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=300, env=env)
    assert r.returncode == 0 and "FRAMEWORKLESS_OK" in r.stdout, \
        (r.stdout, r.stderr)
