"""--mode serve: checkpoint -> HTTP caption daemon, end to end.

Train a tiny model through the real loop, start the daemon via
tools.serve_captions (the CLI dispatch target), POST .npy features over a
real socket, and check the caption against --mode-decode semantics (the
continuous pool's greedy ≡ batch greedy is locked elsewhere; here we pin the
checkpoint-loading + vocab + HTTP glue)."""

import io
import json
import os
import urllib.request

import numpy as np

from tests.test_train_loop import tiny_config, _build


def test_serve_mode_end_to_end(tmp_path):
    from vcr_tpu.train.loop import train
    from vcr_tpu.tools import serve_captions

    tmp = str(tmp_path)
    _build(tmp)
    cfg = tiny_config(tmp, epochs=1, dropout_p=0.0)
    train(cfg)

    serve_cfg = cfg.replace(mode="serve", serve_port=0, serve_slots=2,
                            serve_admit_chunk=1)
    server = serve_captions(serve_cfg, block=False)
    try:
        # the SERVE-TIME flags must win over the checkpoint-embedded config
        # (regression: adopt_checkpoint_config used to clobber them with the
        # training-time defaults — port 8000, R=64)
        assert server.port != 8000  # serve_port=0 -> OS-assigned
        assert server.captioner.slots == 2
        assert server.captioner.admit_chunk == 1
        feats = np.random.default_rng(0).standard_normal(
            (4, 12)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, feats)
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/caption", data=buf.getvalue())
        resp = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert isinstance(resp["caption"], str)
        assert all(isinstance(t, int) for t in resp["tokens"])
        assert 1 <= len(resp["tokens"]) <= 6  # max_len from the checkpoint

        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30).read())
        assert health["status"] == "ok" and health["served"] == 1
    finally:
        server.close()

    # freeze the pool (--mode export_continuous) and serve the ARTIFACT:
    # --mode serve detects the directory kind; captions come from the
    # meta-embedded detokenizer, no checkpoint/vocab load
    from vcr_tpu.tools import export_continuous_artifact

    art_dir = export_continuous_artifact(
        cfg.replace(mode="export_continuous", serve_slots=2,
                    serve_admit_chunk=1))
    assert os.path.exists(os.path.join(art_dir, "meta.json"))
    server2 = serve_captions(serve_cfg.replace(pretrained_base=art_dir),
                             art_dir, block=False)
    try:
        feats = np.random.default_rng(1).standard_normal(
            (4, 12)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, feats)
        req = urllib.request.Request(
            f"http://127.0.0.1:{server2.port}/caption", data=buf.getvalue())
        resp = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert isinstance(resp["caption"], str)
        assert all(isinstance(t, int) for t in resp["tokens"])
    finally:
        server2.close()


def test_serve_models_multi_end_to_end(tmp_path):
    """--serve_models name=path,...: one daemon, several backends — here a
    LIVE checkpoint and its FROZEN continuous artifact side by side (same
    weights -> identical captions through both routes)."""
    from vcr_tpu.tools import export_continuous_artifact, serve_captions
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    _build(tmp)
    cfg = tiny_config(tmp, epochs=1, dropout_p=0.0)
    train(cfg)
    art_dir = export_continuous_artifact(
        cfg.replace(mode="export_continuous", serve_slots=2,
                    serve_admit_chunk=1))

    serve_cfg = cfg.replace(
        mode="serve", serve_port=0, serve_slots=2, serve_admit_chunk=1,
        serve_models=f"live={cfg.save_path},frozen={art_dir}")
    server = serve_captions(serve_cfg, block=False)
    try:
        assert set(server.servers) == {"live", "frozen"}
        feats = np.random.default_rng(0).standard_normal(
            (4, 12)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, feats)
        outs = {}
        for name in ("live", "frozen"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/caption/{name}",
                data=buf.getvalue())
            outs[name] = json.loads(
                urllib.request.urlopen(req, timeout=120).read())
        assert outs["live"]["tokens"] == outs["frozen"]["tokens"]
        assert outs["live"]["caption"] == outs["frozen"]["caption"]

        models = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/models", timeout=30).read())
        assert set(models["models"]) == {"live", "frozen"}
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30).read())
        assert health["status"] == "ok"
        assert health["models"]["live"]["served"] == 1
        assert health["models"]["frozen"]["served"] == 1
    finally:
        server.close()
