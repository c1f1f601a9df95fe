"""Multi-model serving daemon (vcr_tpu/multiserver.py).

Two model backends (different params — cross-wiring detectable) behind one
port: routed captions must match each model's own batch greedy oracle,
/models lists both, /healthz aggregates, and /metrics is a VALID exposition
(HELP/TYPE once per metric, samples labeled model="...").
"""

import io
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from vcr_tpu.decode import decode_tokens
from vcr_tpu.models import base
from vcr_tpu.multiserver import MultiCaptionServer
from vcr_tpu.serving_continuous import ContinuousCaptioner


def _spec(tiny_vocab):
    return base.ModelSpec(
        arch="s2vt", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=12,
        max_len=7, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32")


def _post(port, path, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as r:
        return r.read().decode()


def _want(params, spec, feats, eos_id):
    toks, _ = decode_tokens(params, spec, feats, eos_id, beam_size=1)
    rows = np.asarray(toks)[:, 0]
    out = []
    for row in rows:
        hits = np.nonzero(row == eos_id)[0]
        out.append([int(t) for t in (row[: hits[0] + 1]
                                     if len(hits) else row)])
    return out


def test_multi_model_routing_and_observability(tiny_vocab, rng):
    spec = _spec(tiny_vocab)
    init = base.build_model("s2vt")[0]
    params_a = init(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    params_b = init(jax.random.PRNGKey(77), spec, tiny_vocab.vectors)
    feats = rng.standard_normal((4, 4, 12)).astype(np.float32)
    want_a = _want(params_a, spec, feats, tiny_vocab.eos_id)
    want_b = _want(params_b, spec, feats, tiny_vocab.eos_id)
    # the two models must disagree somewhere or routing bugs are invisible
    assert want_a != want_b

    cc_a = ContinuousCaptioner(params_a, spec, slots=2, admit_chunk=1,
                               eos_id=tiny_vocab.eos_id)
    cc_b = ContinuousCaptioner(params_b, spec, slots=3, admit_chunk=2,
                               eos_id=tiny_vocab.eos_id)
    with MultiCaptionServer({"alpha": (cc_a, tiny_vocab),
                             "beta": (cc_b, tiny_vocab)}) as ms:
        # routing: each model serves ITS captions
        for i in range(4):
            ra = _post(ms.port, "/caption/alpha", feats[i])
            rb = _post(ms.port, "/caption/beta", feats[i])
            assert ra["tokens"] == want_a[i]
            assert rb["tokens"] == want_b[i]
            assert isinstance(ra["caption"], str)
        # bulk per model
        batch = _post(ms.port, "/caption_batch/beta", feats)
        assert [r["tokens"] for r in batch["results"]] == want_b

        # /models
        models = json.loads(_get(ms.port, "/models"))["models"]
        assert set(models) == {"alpha", "beta"}
        assert models["alpha"]["slots"] == 2
        assert models["beta"]["slots"] == 3
        assert models["alpha"]["arch"] == "s2vt"

        # /healthz aggregates per model
        health = json.loads(_get(ms.port, "/healthz"))
        assert health["status"] == "ok"
        assert health["models"]["alpha"]["served"] == 4
        assert health["models"]["beta"]["served"] == 8
        assert health["models"]["beta"]["in_flight"] == 0

        # /metrics: HELP/TYPE once per metric, one labeled sample per model
        text = _get(ms.port, "/metrics")
        assert text.count("# TYPE vcr_requests_served_total counter") == 1
        assert 'vcr_requests_served_total{model="alpha"} 4' in text
        assert 'vcr_requests_served_total{model="beta"} 8' in text
        assert 'vcr_up{model="alpha"} 1' in text
        assert ('vcr_request_latency_seconds{model="beta",quantile="0.5"}'
                in text)

        # unknown model / malformed path -> 404 with guidance
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(ms.port, "/caption/nope", feats[0])
        assert ei.value.code == 404
        assert "unknown model" in json.loads(ei.value.read())["error"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(ms.port, "/caption", feats[0])
        assert ei.value.code == 404
        # per-request sampling rejected on pools built without it
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(ms.port, "/caption/alpha?temperature=2.0", feats[0])
        assert ei.value.code == 400

    assert cc_a.stats["served"] == 4 and cc_b.stats["served"] == 8


def test_multi_model_constructor_validation(tiny_vocab):
    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id)
    with pytest.raises(ValueError, match="at least one"):
        MultiCaptionServer({})
    with pytest.raises(ValueError, match="must match"):
        MultiCaptionServer({"bad/name": cc})


def test_caption_client_model_routing(tiny_vocab, rng):
    """CaptionClient(model=...) talks to a multi daemon: routed captions,
    caption_batch, and the models() listing."""
    from vcr_tpu.client import CaptionClient

    spec = _spec(tiny_vocab)
    init = base.build_model("s2vt")[0]
    params_a = init(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    params_b = init(jax.random.PRNGKey(77), spec, tiny_vocab.vectors)
    feats = rng.standard_normal((3, 4, 12)).astype(np.float32)
    want_a = _want(params_a, spec, feats, tiny_vocab.eos_id)
    want_b = _want(params_b, spec, feats, tiny_vocab.eos_id)

    cc_a = ContinuousCaptioner(params_a, spec, slots=2, admit_chunk=1,
                               eos_id=tiny_vocab.eos_id)
    cc_b = ContinuousCaptioner(params_b, spec, slots=2, admit_chunk=1,
                               eos_id=tiny_vocab.eos_id)
    with MultiCaptionServer({"a": (cc_a, tiny_vocab),
                             "b": (cc_b, tiny_vocab)}) as ms:
        url = f"http://127.0.0.1:{ms.port}"
        ca = CaptionClient(url, model="a")
        cb = CaptionClient(url, model="b")
        assert set(ca.models()) == {"a", "b"}
        toks, cap = ca.caption(feats[0])
        assert toks == want_a[0] and isinstance(cap, str)
        rows = cb.caption_batch(feats)
        assert [t for t, _ in rows] == want_b
