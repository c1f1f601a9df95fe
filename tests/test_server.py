"""HTTP caption-serving daemon (vcr_tpu/server.py).

Real sockets, real threads: concurrent POSTs from client threads multiplex
onto one continuous-batching slot pool; responses must be token-exact vs the
batch greedy oracle and carry detokenized captions.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from vcr_tpu.decode import decode_tokens
from vcr_tpu.models import base
from vcr_tpu.serving_continuous import ContinuousCaptioner
from vcr_tpu.server import CaptionServer


def _spec(tiny_vocab):
    return base.ModelSpec(
        arch="s2vt", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=12,
        max_len=7, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32")


def _post_npy(port, arr, path="/caption"):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_http_serving_end_to_end(tiny_vocab, rng):
    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((6, 4, 12)).astype(np.float32)

    toks, _ = decode_tokens(params, spec, feats, tiny_vocab.eos_id,
                            beam_size=1)
    rows = np.asarray(toks)[:, 0]
    want = []
    for row in rows:
        hits = np.nonzero(row == tiny_vocab.eos_id)[0]
        want.append(list(row[: hits[0] + 1] if len(hits) else row))

    cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id)
    with CaptionServer(cc, vocab=tiny_vocab) as server:
        # concurrent clients multiplex onto the one slot pool
        results = [None] * 6
        def client(i):
            results[i] = _post_npy(server.port, feats[i])
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)

        for i in range(6):
            assert results[i] is not None, f"client {i} got no response"
            assert [int(t) for t in results[i]["tokens"]] == [
                int(t) for t in want[i]]
            assert isinstance(results[i]["caption"], str)

        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30).read())
        assert health["status"] == "ok"
        assert health["served"] == 6
        assert health["in_flight"] == 0
        assert 0 < health["latency_p50_ms"] <= health["latency_p95_ms"]

        # malformed body -> 400, wrong shape -> 400, unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/caption", data=b"not npy")
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_npy(server.port, np.zeros((2, 2), np.float32))
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_npy(server.port, feats[0], path="/nope")
        assert e.value.code == 404

    assert server.error is None


def test_client_and_metrics(tiny_vocab, rng):
    """CaptionClient drives the server end-to-end (caption_many concurrency,
    health, Prometheus /metrics) token-exact vs the batch greedy oracle."""
    from vcr_tpu.client import CaptionClient, CaptionServerError

    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(5), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((5, 4, 12)).astype(np.float32)
    toks, _ = decode_tokens(params, spec, feats, tiny_vocab.eos_id,
                            beam_size=1)
    rows = np.asarray(toks)[:, 0]
    want = []
    for row in rows:
        hits = np.nonzero(row == tiny_vocab.eos_id)[0]
        want.append([int(t) for t in
                     (row[: hits[0] + 1] if len(hits) else row)])

    cc = ContinuousCaptioner(params, spec, slots=3, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id)
    with CaptionServer(cc, vocab=tiny_vocab) as server:
        client = CaptionClient(f"http://127.0.0.1:{server.port}")
        client.wait_ready(timeout_s=30)

        results = client.caption_many(list(feats), max_workers=5)
        for (tokens, caption), w in zip(results, want):
            assert tokens == w
            assert isinstance(caption, str)

        health = client.health()
        assert health["served"] == 5 and health["status"] == "ok"

        text = client.metrics()
        assert "# TYPE vcr_requests_served_total counter" in text
        assert "vcr_requests_served_total 5" in text
        assert "vcr_up 1" in text
        assert "vcr_in_flight 0" in text
        assert "vcr_request_latency_seconds_count 5" in text
        occ = [ln for ln in text.splitlines()
               if ln.startswith("vcr_occupancy ")]
        assert occ and 0.0 < float(occ[0].split()[1]) <= 1.0
        p50 = [ln for ln in text.splitlines()
               if ln.startswith('vcr_request_latency_seconds{quantile="0.5"}')]
        assert p50 and float(p50[0].split()[-1]) > 0

        # server-side errors surface as typed exceptions with the code
        with pytest.raises(CaptionServerError) as e:
            client.caption(np.zeros((2, 2), np.float32))
        assert e.value.code == 400

    assert server.error is None


def test_client_retries_connection(tiny_vocab):
    """Connection-level failures retry with backoff, then raise."""
    from vcr_tpu.client import CaptionClient

    client = CaptionClient("http://127.0.0.1:1", timeout_s=1,
                           retries=1, backoff_s=0.01)
    with pytest.raises(Exception):
        client.health()


def test_submit_api_without_http(tiny_vocab, rng):
    """submit() is the embeddable path (no sockets): same oracle."""
    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(9), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((4, 12)).astype(np.float32)
    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id)
    server = CaptionServer(cc).start()
    try:
        got = server.submit(feats)
        toks, _ = decode_tokens(params, spec, feats[None], tiny_vocab.eos_id,
                                beam_size=1)
        row = np.asarray(toks)[0, 0]
        hits = np.nonzero(row == tiny_vocab.eos_id)[0]
        want = row[: hits[0] + 1] if len(hits) else row
        np.testing.assert_array_equal(got, want)
    finally:
        server.close()


def test_http_per_request_sampling(tiny_vocab, rng):
    """?temperature=&top_k=&top_p= set vLLM-style per-request sampling:
    top_k=1 stays greedy-exact, a hot request samples, bad/unknown params
    are 400s, and a pool built without sampling refuses opts with a 400."""
    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((2, 4, 12)).astype(np.float32)
    toks, _ = decode_tokens(params, spec, feats, tiny_vocab.eos_id,
                            beam_size=1)
    row = np.asarray(toks)[0, 0]
    hits = np.nonzero(row == tiny_vocab.eos_id)[0]
    want = [int(t) for t in (row[: hits[0] + 1] if len(hits) else row)]

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id, request_sampling=True,
                             rng=jax.random.PRNGKey(1))
    with CaptionServer(cc, vocab=tiny_vocab) as server:
        # no params and explicit argmax params are both greedy-exact
        got = _post_npy(server.port, feats[0])
        assert [int(t) for t in got["tokens"]] == want
        got = _post_npy(server.port, feats[0],
                        path="/caption?temperature=0.9&top_k=1")
        assert [int(t) for t in got["tokens"]] == want
        # a hot request completes under the eos/max_len protocol
        got = _post_npy(server.port, feats[1],
                        path="/caption?temperature=8.0&top_p=0.95")
        assert 1 <= len(got["tokens"]) <= spec.max_len
        # malformed / unknown params -> 400 before touching the pool
        for q in ("temperature=hot", "beam=3"):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post_npy(server.port, feats[0], path=f"/caption?{q}")
            assert e.value.code == 400
    assert server.error is None

    # greedy-built pool: sampling params are refused, not ignored
    cc2 = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                              eos_id=tiny_vocab.eos_id)
    with CaptionServer(cc2, vocab=tiny_vocab) as server:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_npy(server.port, feats[0], path="/caption?temperature=2.0")
        assert e.value.code == 400
        with pytest.raises(ValueError):
            server.submit(feats[0], opts={"temperature": 2.0})
    assert server.error is None


def test_backpressure_rejects_at_max_pending(tiny_vocab, rng):
    """Outstanding requests beyond max_pending are refused (ServerOverloaded
    from submit, 503 + Retry-After over HTTP) instead of queueing without
    bound."""
    from vcr_tpu.server import ServerOverloaded

    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id)
    feats = rng.standard_normal((4, 12)).astype(np.float32)

    # scheduler NOT started: the first submit parks on its event, the second
    # must bounce deterministically
    server = CaptionServer(cc, max_pending=1, request_timeout_s=1.0)
    t = threading.Thread(target=server.submit, args=(feats,))
    t.start()
    for _ in range(100):
        with server._lock:
            if server._events:
                break
        import time
        time.sleep(0.01)
    with pytest.raises(ServerOverloaded):
        server.submit(feats)
    assert server._rejected == 1
    t.join(timeout=10)
    assert not t.is_alive()

    # HTTP mapping: 503 + Retry-After (patch submit so no pool is needed)
    cc2 = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                              eos_id=tiny_vocab.eos_id)
    with CaptionServer(cc2, vocab=tiny_vocab) as srv:
        srv.submit = lambda *a, **k: (_ for _ in ()).throw(
            ServerOverloaded("full"))
        try:
            _post_npy(srv.port, feats)
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers["Retry-After"] == "1"
            assert "full" in json.loads(e.read())["error"]


def test_client_timeout_cancels_and_slot_is_reclaimed(tiny_vocab, rng):
    """A request whose client gave up (timeout 0) is cancelled scheduler-side:
    the cancel set drains, no slot stays occupied, and later requests are
    served normally."""
    import time

    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             step_chunk=1, eos_id=tiny_vocab.eos_id)
    feats = rng.standard_normal((4, 12)).astype(np.float32)

    with CaptionServer(cc, vocab=tiny_vocab) as server:
        # warm the pool so the timed-out request isn't also paying compiles
        assert server.submit(feats) is not None
        server.request_timeout_s = 0.0
        assert server.submit(feats) is None         # client gives up at once
        server.request_timeout_s = 120.0
        toks = server.submit(feats)                 # pool still healthy
        assert toks is not None and len(toks) >= 1
        # the abandoned request resolves: cancel set drains, nothing pinned
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            with server._lock:
                if not server._cancelled and cc.in_flight == 0:
                    break
            time.sleep(0.05)
        with server._lock:
            assert not server._cancelled
        assert cc.in_flight == 0
        assert cc.stats["served"] + cc.stats["cancelled"] >= 2


def test_hostile_sampling_params_rejected_server_survives(tiny_vocab, rng):
    """Adversarial query params must 400 at the API layer and must NEVER
    kill the scheduler thread: top_k past int32 raised OverflowError inside
    encode_admit before validation existed (a one-request remote DoS), and
    NaN temperature slips past a plain `t <= 0` greedy check."""
    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id, request_sampling=True,
                             rng=jax.random.PRNGKey(0))
    feats = rng.standard_normal((3, 4, 12)).astype(np.float32)
    hostile = ["top_k=99999999999", "top_k=-1", "temperature=nan",
               "temperature=inf", "temperature=-1", "top_p=1.5",
               "top_p=-0.1", "top_p=nan", "temperature="]
    with CaptionServer(cc, vocab=tiny_vocab) as server:
        # a malformed FIRST request (wrong rank) must 400, not become the
        # server's adopted shape and crash the encode on the scheduler thread
        for bad in (feats[0, 0], feats[0, :, :6], feats):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post_npy(server.port, bad)
            assert ei.value.code == 400
            assert "expected (4, 12)" in json.loads(ei.value.read())["error"]
        for q in hostile:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post_npy(server.port, feats[0], path=f"/caption?{q}")
            assert ei.value.code == 400, q
        # the daemon is still healthy and still serves
        r = _post_npy(server.port, feats[0])
        assert len(r["tokens"]) >= 1
        assert server.error is None

    # defense in depth: even if a front end skips validation, the pool's
    # encode_admit sanitizes instead of crashing the scheduler thread
    got = dict(cc.caption_stream([
        (0, feats[0], {"top_k": 99999999999}),
        (1, feats[1], {"temperature": float("nan")}),
        (2, feats[2], {"temperature": float("inf")}),
    ]))
    assert sorted(got) == [0, 1, 2]

    # family-aware shape validation, spatial included
    assert cc.check_feat_shape((4, 12)) is None
    assert "expected (4, 12)" in cc.check_feat_shape((12,))
    sspec = base.ModelSpec(
        arch="spatial", base_arch="s2vt", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=8, vid_feat_size=6,
        max_len=7, num_frames=4, dropout_p=0.0, sos_id=tiny_vocab.sos_id,
        compute_dtype="float32")
    sparams = base.build_model("spatial")[0](jax.random.PRNGKey(2), sspec,
                                             tiny_vocab.vectors)
    scc = ContinuousCaptioner(sparams, sspec, slots=2, admit_chunk=1,
                              eos_id=tiny_vocab.eos_id)
    assert scc.check_feat_shape((4, 6, 3, 3)) is None
    assert scc.check_feat_shape((4, 6, 3, 2)) is not None
    assert scc.check_feat_shape((4, 6)) is not None


def test_serve_request_sampling_is_opt_in(tiny_vocab, rng, tmp_path):
    """--mode serve defaults to the pure-greedy step path (argmax, no
    sampling tax); --serve_request_sampling true switches the pool to accept
    per-request params."""
    from tests.util_corpus import build_corpus
    from vcr_tpu.config import get_config
    from vcr_tpu.tools import serve_captions

    data = tmp_path / "data"
    models = tmp_path / "models"
    build_corpus(str(data))
    common = ["--data_dir", str(data), "--corpus", "msvd_vgg",
              "--glove_emb_file", "glove_tiny.txt", "--num_frames", "4",
              "--vid_feat_size", "12", "--max_len", "6", "--hidden_size",
              "8", "--bsize", "4", "--save_path", str(models),
              "--log_dir", "", "--seed", "123",
              "--compute_dtype", "float32"]
    from vcr_tpu.cli import main as cli_main
    cli_main(["--mode", "train", *common, "--arch", "s2vt",
              "--epochs", "1", "--lr", "1e-2"])

    cfg = get_config(["--mode", "serve", *common, "--serve_port", "0",
                      "--serve_slots", "2", "--serve_admit_chunk", "1"])
    srv = serve_captions(cfg, block=False)
    try:
        assert not srv.captioner.accepts_request_opts
        assert not srv.captioner._sample
    finally:
        srv.close()

    cfg = get_config(["--mode", "serve", *common, "--serve_port", "0",
                      "--serve_slots", "2", "--serve_admit_chunk", "1",
                      "--serve_request_sampling", "true"])
    srv = serve_captions(cfg, block=False)
    try:
        assert srv.captioner.accepts_request_opts
        feats = rng.standard_normal((4, 12)).astype(np.float32)
        r = _post_npy(srv.port, feats, path="/caption?temperature=2.0")
        assert len(r["tokens"]) >= 1
    finally:
        srv.close()


def test_profile_endpoint(tiny_vocab, rng, tmp_path):
    """POST /profile captures a real jax.profiler trace of live serving into
    the opt-in directory; disabled servers 403; concurrent captures 409."""
    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((4, 12)).astype(np.float32)

    def post_profile(port, q=""):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/profile{q}", data=b"")
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id)
    # disabled by default
    with CaptionServer(cc) as server:
        with pytest.raises(urllib.error.HTTPError) as ei:
            post_profile(server.port)
        assert ei.value.code == 403

    cc2 = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                              eos_id=tiny_vocab.eos_id)
    pdir = str(tmp_path / "traces")
    import os as _os
    _os.makedirs(pdir)
    with CaptionServer(cc2, vocab=tiny_vocab, profile_dir=pdir) as server:
        # capture while a request decodes: drive one in a thread
        t = threading.Thread(target=server.submit, args=(feats,))
        t.start()
        r = post_profile(server.port, "?seconds=0.3")
        t.join(timeout=60)
        assert r["trace_dir"].startswith(pdir)
        files = [f for _, _, fs in _os.walk(r["trace_dir"]) for f in fs]
        assert files, "trace dir is empty"
        # bad params
        for q in ("?seconds=0", "?seconds=120", "?seconds=abc", "?foo=1"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                post_profile(server.port, q)
            assert ei.value.code == 400, q


def test_caption_batch_endpoint(tiny_vocab, rng):
    """POST /caption_batch: one request carries a (B, ...) batch; rows come
    back in input order, token-exact vs the batch greedy oracle, through
    CaptionClient.caption_batch."""
    from vcr_tpu.client import CaptionClient

    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((5, 4, 12)).astype(np.float32)
    toks, _ = decode_tokens(params, spec, feats, tiny_vocab.eos_id,
                            beam_size=1)
    rows = np.asarray(toks)[:, 0]
    want = []
    for row in rows:
        hits = np.nonzero(row == tiny_vocab.eos_id)[0]
        want.append([int(t) for t in
                     (row[: hits[0] + 1] if len(hits) else row)])

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=2,
                             step_chunk=2, eos_id=tiny_vocab.eos_id)
    with CaptionServer(cc, vocab=tiny_vocab) as server:
        client = CaptionClient(f"http://127.0.0.1:{server.port}")
        results = client.caption_batch(feats)
        assert len(results) == 5
        for r, w in zip(results, want):
            assert r is not None
            tokens, caption = r
            assert tokens == w
            assert isinstance(caption, str)
        # a 1-D body (not a batch) fails loudly
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_npy(server.port, feats[0, 0], path="/caption_batch")
        assert ei.value.code == 400
        # a batch larger than max_pending drains in waves (no 503) ...
        server.max_pending = 3
        got = _post_npy(server.port, feats, path="/caption_batch")
        assert [r["tokens"] for r in got["results"]] == want
        # ... but a wave blocked by OTHER outstanding traffic is refused
        # whole (genuinely transient -> ServerOverloaded)
        from vcr_tpu.server import ServerOverloaded
        import threading as _threading
        with server._lock:
            server._events["fake1"] = _threading.Event()
            server._events["fake2"] = _threading.Event()
        with pytest.raises(ServerOverloaded):
            server.submit_many(feats[:2])
        assert server._rejected == 2
        with server._lock:
            server._events.pop("fake1")
            server._events.pop("fake2")
    assert server.error is None


def test_caption_batch_waves_exceed_max_pending(tiny_vocab, rng):
    """A batch larger than max_pending drains in sequential waves instead of
    being permanently unserveable; per-row latencies are recorded at harvest
    (count == rows, values spread across completion ticks)."""
    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((7, 4, 12)).astype(np.float32)
    toks, _ = decode_tokens(params, spec, feats, tiny_vocab.eos_id,
                            beam_size=1)
    rows = np.asarray(toks)[:, 0]
    want = []
    for row in rows:
        hits = np.nonzero(row == tiny_vocab.eos_id)[0]
        want.append([int(t) for t in
                     (row[: hits[0] + 1] if len(hits) else row)])

    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             step_chunk=1, eos_id=tiny_vocab.eos_id)
    with CaptionServer(cc, vocab=tiny_vocab, max_pending=3) as server:
        got = server.submit_many(feats)           # 7 rows through waves of 3
        assert [list(map(int, t)) for t in got] == want
        assert server._rejected == 0
        assert server._lat_count == 7
    assert server.error is None


def test_healthz_503_when_scheduler_dead(tiny_vocab):
    """A dead scheduler must flip /healthz to 503 (the load-balancer
    convention the docs promise), for both daemons."""
    from vcr_tpu.multiserver import MultiCaptionServer

    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id)
    with CaptionServer(cc) as server:
        server.error = "boom"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/healthz", timeout=30)
        assert ei.value.code == 503
        server.error = None

    cc2 = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                              eos_id=tiny_vocab.eos_id)
    with MultiCaptionServer({"m": cc2}) as ms:
        ms.servers["m"].error = "boom"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{ms.port}/healthz", timeout=30)
        assert ei.value.code == 503
        body = json.loads(ei.value.read())
        assert body["status"] == "error"
        assert body["models"]["m"]["error"] == "boom"
        ms.servers["m"].error = None


def test_auth_token_and_body_limit(tiny_vocab, rng, tmp_path):
    """auth_token gates POST routes with 401 (healthz/metrics stay open);
    oversized bodies get 413; CaptionClient(token=) authenticates."""
    from vcr_tpu.client import CaptionClient, CaptionServerError

    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((4, 12)).astype(np.float32)
    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id)
    pdir = str(tmp_path / "tr")
    import os as _os
    _os.makedirs(pdir)
    with CaptionServer(cc, vocab=tiny_vocab, auth_token="s3cret",
                       profile_dir=pdir, max_body_mb=0.001) as server:
        url = f"http://127.0.0.1:{server.port}"
        # open probes
        health = json.loads(urllib.request.urlopen(f"{url}/healthz",
                                                   timeout=30).read())
        assert health["status"] == "ok"
        assert "vcr_up" in urllib.request.urlopen(f"{url}/metrics",
                                                  timeout=30).read().decode()
        # unauthenticated POSTs -> 401 with a WWW-Authenticate header
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_npy(server.port, feats)
        assert ei.value.code == 401
        assert ei.value.headers["WWW-Authenticate"] == "Bearer"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(urllib.request.Request(
                f"{url}/profile?seconds=0.1", data=b""), timeout=30)
        assert ei.value.code == 401
        # wrong token -> 401; right token -> served
        bad = CaptionClient(url, token="wrong", retries=0)
        with pytest.raises(CaptionServerError) as e2:
            bad.caption(feats)
        assert e2.value.code == 401
        good = CaptionClient(url, token="s3cret", retries=0)
        toks, cap = good.caption(feats)
        assert len(toks) >= 1 and isinstance(cap, str)
        # body past max_body_mb (0.001 MiB ~ 1 KiB) -> 413
        with pytest.raises(CaptionServerError) as e3:
            good.caption_batch(np.zeros((64, 4, 12), np.float32))
        assert e3.value.code == 413
    assert server.error is None


def test_auth_token_multi_daemon(tiny_vocab, rng):
    """The multi daemon applies the same bearer gate on its routes."""
    from vcr_tpu.client import CaptionClient, CaptionServerError
    from vcr_tpu.multiserver import MultiCaptionServer

    spec = _spec(tiny_vocab)
    params = base.build_model("s2vt")[0](jax.random.PRNGKey(3), spec,
                                         tiny_vocab.vectors)
    feats = rng.standard_normal((4, 12)).astype(np.float32)
    cc = ContinuousCaptioner(params, spec, slots=2, admit_chunk=1,
                             eos_id=tiny_vocab.eos_id)
    with MultiCaptionServer({"m": (cc, tiny_vocab)},
                            auth_token="tok") as ms:
        url = f"http://127.0.0.1:{ms.port}"
        with pytest.raises(CaptionServerError) as ei:
            CaptionClient(url, model="m", retries=0).caption(feats)
        assert ei.value.code == 401
        toks, cap = CaptionClient(url, model="m", token="tok",
                                  retries=0).caption(feats)
        assert len(toks) >= 1
        # /models and /healthz stay open
        assert "m" in CaptionClient(url).models()
