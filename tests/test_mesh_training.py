"""End-to-end training through the real train loop on a multi-device mesh
(8 virtual CPU devices, dp=4 x mp=2) — the config-driven SPMD path."""

import os

import numpy as np


def test_train_loop_on_mesh(tmp_path):
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    cfg = tiny_config(tmp, epochs=2, mesh_dp=4, mesh_mp=2, vocab_pad_to=8)
    metrics = train(cfg)
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["acc"] <= 1.0
    assert os.path.exists(os.path.join(cfg.save_path, "model_latest", "meta.json"))


def test_mesh_matches_single_device_loss(tmp_path):
    """First-epoch val loss identical (float tolerance) between 1-device and
    4x2-mesh runs with the same seed (fp32, no dropout)."""
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    # vocab_pad_to changes init shapes (and therefore the random draw), so it
    # must match across the two runs — only the mesh differs.
    m1 = train(tiny_config(tmp, epochs=1, dropout_p=0.0, vocab_pad_to=8,
                           save_path=os.path.join(tmp, "m1")))
    m2 = train(tiny_config(tmp, epochs=1, dropout_p=0.0, mesh_dp=4, mesh_mp=2,
                           vocab_pad_to=8, save_path=os.path.join(tmp, "m2")))
    assert abs(m1["loss"] - m2["loss"]) < 1e-4
    assert abs(m1["acc"] - m2["acc"]) < 1e-5
