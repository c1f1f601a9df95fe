"""CLI dispatch, caption/glove prep, sweep expansion, and the attention-export
path end-to-end on synthetic data."""

import json
import os

import numpy as np
import pytest

from vcr_tpu.config import Config


def test_extract_captions_msvd_vgg(tmp_path):
    from vcr_tpu.data.prep.captions import extract_captions_msvd_vgg

    cdir = tmp_path / "data" / "msvd_vgg"
    cdir.mkdir(parents=True)
    for split in ("train", "val", "test"):
        (cdir / f"sents_{split}_lc_nopunc.txt").write_text(
            "vid1\ta man is playing guitar\n"
            "vid1\tsomeone plays a guitar\n"
            "vid2\ta dog runs\n")
    extract_captions_msvd_vgg(str(tmp_path / "data"))
    out = json.loads((cdir / "train_captions.json").read_text())
    assert len(out) == 2
    by_key = {v["video_key"]: v for v in out}
    assert len(by_key["vid1"]["captions"]) == 2
    assert by_key["vid2"]["captions"][0]["desc"] == "a dog runs"


def test_extract_captions_msvd(tmp_path):
    from vcr_tpu.data.prep.captions import extract_captions_msvd

    cdir = tmp_path / "data" / "msvd"
    (cdir / "clips").mkdir(parents=True)
    (cdir / "clips" / "vidA_1_5.avi").write_bytes(b"x")
    (cdir / "multilingual_corpus.csv").write_text(
        "VideoID,Start,End,Language,Source,Description\n"
        "vidA,1,5,English,web,a man is playing guitar\n"
        "vidA,1,5,English,web,someone plays music\n"
        "vidA,1,5,French,web,un homme joue\n"
        "vidB,2,6,English,web,missing video\n")
    extract_captions_msvd(str(tmp_path / "data"), seed=0)
    train = json.loads((cdir / "train_captions.json").read_text())
    val = json.loads((cdir / "val_captions.json").read_text())
    allv = train + val
    assert len(allv) == 1  # vidB dropped (no clip), French dropped
    assert len(allv[0]["captions"]) == 2


def test_extract_captions_msrvtt(tmp_path):
    from vcr_tpu.data.prep.captions import extract_captions_msrvtt

    cdir = tmp_path / "data" / "msrvtt"
    (cdir / "clips").mkdir(parents=True)
    for vid in ("video1", "video2"):
        (cdir / "clips" / f"{vid}.mp4").write_bytes(b"x")
    info = {
        "videos": [{"video_id": "video1"}, {"video_id": "video2"},
                   {"video_id": "video3"}],
        "sentences": [
            {"video_id": "video1", "caption": "a man sings", "sen_id": 0},
            {"video_id": "video1", "caption": "a person singing", "sen_id": 1},
            {"video_id": "video2", "caption": "a dog barks", "sen_id": 2},
            {"video_id": "video3", "caption": "dropped", "sen_id": 3},
        ],
    }
    (cdir / "videodatainfo_2017_ustc.json").write_text(json.dumps(info))
    extract_captions_msrvtt(str(tmp_path / "data"), seed=0)
    train = json.loads((cdir / "train_captions.json").read_text())
    val = json.loads((cdir / "val_captions.json").read_text())
    ids = {v["video_id"] for v in train + val}
    assert ids == {"video1", "video2"}  # video3 dropped


def test_extract_glove(tmp_path):
    from vcr_tpu.data.prep.glove import extract_glove

    data = tmp_path / "data"
    (data / "glove").mkdir(parents=True)
    (data / "msvd_vgg").mkdir()
    (data / "glove" / "glove_test.txt").write_text(
        "man 0.1 0.2\nguitar 0.3 0.4\nzebra 0.5 0.6\n")
    (data / "msvd_vgg" / "train_captions.json").write_text(json.dumps(
        [{"video_key": "v1", "captions": [{"desc": "a Man plays GUITAR"}]}]))
    cfg = Config(data_dir=str(data), corpus="msvd_vgg")
    extract_glove(cfg)
    out = (data / "msvd_vgg" / "glove" / "glove_test.txt").read_text()
    assert "man 0.1 0.2" in out and "guitar 0.3 0.4" in out
    assert "zebra" not in out


def test_cli_argv_dispatch(tmp_path, capsys):
    """The generated argparse surface: every reference flag parses, types are
    coerced, and --mode dispatches (exercised via extract_captions)."""
    from vcr_tpu.cli import main
    from vcr_tpu.config import build_parser

    ns = build_parser().parse_args(
        ["--mode", "train", "--lr", "3e-4", "--bsize", "16",
         "--schedule_sample", "true", "--resume", "false",
         "--mesh_dp", "2", "--corpus", "msvd"])
    assert ns.lr == 3e-4 and ns.bsize == 16
    assert ns.schedule_sample is True and ns.resume is False
    assert ns.mesh_dp == 2

    cdir = tmp_path / "data" / "msvd_vgg"
    cdir.mkdir(parents=True)
    for split in ("train", "val", "test"):
        (cdir / f"sents_{split}_lc_nopunc.txt").write_text("vid1\ta dog runs\n")
    main(["--mode", "extract_captions", "--corpus", "msvd_vgg",
          "--data_dir", str(tmp_path / "data")])
    assert (cdir / "train_captions.json").exists()
    assert "MSVD_VGG corpus" in capsys.readouterr().out


def test_sweep_expand_and_emit():
    from vcr_tpu.sweep import emit_commands, expand_grid

    grid = {"corpus": "msvd", "lr": [1e-4, 3e-4], "seed": [1, 2]}
    points = list(expand_grid(grid))
    assert len(points) == 4
    assert all(p["corpus"] == "msvd" for p in points)
    cmds = emit_commands(grid)
    assert len(cmds) == 4
    assert all("python -m vcr_tpu.cli" in c for c in cmds)


def test_rationale_export_end_to_end(tmp_path):
    """Train RationaleNet one epoch, export the frame-selection overlay."""
    cv2 = pytest.importorskip("cv2")
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.config import Config
    from vcr_tpu.evals.attention_export import export_rationale_video
    from vcr_tpu.models import base as model_base
    from vcr_tpu.train import checkpoint as ckpt
    from vcr_tpu.train.loop import train
    from vcr_tpu.vocab import Vocab

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"), corpus="msvd")
    cfg = tiny_config(tmp, corpus="msvd", mode="train_rationale", epochs=1,
                      img_size=32)
    train(cfg)

    clips_dir = os.path.join(tmp, "data", "msvd", "clips")
    os.makedirs(clips_dir)
    w = cv2.VideoWriter(os.path.join(clips_dir, "train_vid0.avi"),
                        cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 48))
    for i in range(6):
        w.write(np.full((48, 64, 3), 30 * i, np.uint8))
    w.release()

    params, _, meta = ckpt.load_checkpoint(
        os.path.join(cfg.save_path, "model_best"))
    saved = Config.from_dict(meta["config"])
    vocab = Vocab(os.path.join(saved.data_dir, saved.corpus, "glove",
                               saved.glove_emb_file), seed=saved.seed)
    spec = model_base.spec_from_config(saved, vocab).with_(arch="rationale")
    out = export_rationale_video(
        params, spec, saved, clips_dir,
        os.path.join(tmp, "data", "msvd", "feats"), "train_vid0.avi",
        str(tmp_path))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_attention_export_end_to_end(tmp_path):
    """Train SpatialNet one epoch on synthetic yolo features, then export an
    attention-overlay mp4 for a synthetic clip."""
    cv2 = pytest.importorskip("cv2")
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.evals.attention_export import run_export
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"), corpus="msvd", feat_type="yolo",
                 grid=4)
    cfg = tiny_config(tmp, corpus="msvd", mode="train_spatial", epochs=1,
                      img_size=32)
    train(cfg)

    # a synthetic clip whose bbox feats exist (train_vid0)
    clips_dir = os.path.join(tmp, "data", "msvd", "clips")
    os.makedirs(clips_dir)
    w = cv2.VideoWriter(os.path.join(clips_dir, "train_vid0.avi"),
                        cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 48))
    for i in range(6):
        w.write(np.full((48, 64, 3), 30 * i, np.uint8))
    w.release()

    export_cfg = cfg.replace(
        mode="eval_attention",
        spatial_net_file=os.path.join(cfg.save_path, "model_best"),
        vid_file="train_vid0.avi", export_all=False)
    outs = run_export(export_cfg)
    assert len(outs) == 1 and os.path.exists(outs[0])
    assert os.path.getsize(outs[0]) > 0
    cap = cv2.VideoCapture(outs[0])
    n = 0
    while cap.read()[0]:
        n += 1
    assert n > 0  # playable overlay video

    # --all batch mode (eval_attention.py:137-148)
    outs_all = run_export(export_cfg.replace(export_all=True))
    assert len(outs_all) == 1  # every clip in clips/ (we created one)


def test_sweep_run_in_process(tmp_path):
    """run_sweep executes every grid point and writes result.json files."""
    from tests.util_corpus import build_corpus
    from vcr_tpu.sweep import run_sweep

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"))
    grid = {
        "mode": "train", "corpus": "msvd_vgg",
        "data_dir": os.path.join(tmp, "data"),
        "glove_emb_file": "glove_tiny.txt", "arch": "s2vt",
        "num_frames": 4, "vid_feat_size": 12, "max_len": 6, "hidden_size": 8,
        "bsize": 4, "epochs": 1, "log_iter": 2, "log_dir": "",
        "compute_dtype": "float32", "lr": [1e-2, 1e-3],
    }
    base = os.path.join(tmp, "sweeps")
    run_sweep(grid, base)
    results = [d for d in os.listdir(base)
               if os.path.exists(os.path.join(base, d, "result.json"))]
    assert len(results) == 2
    r = json.loads(open(os.path.join(base, results[0], "result.json")).read())
    assert "METEOR" in r


def test_export_feats_loader_pads_and_truncates(tmp_path):
    """_load_feats_padded must reproduce the runtime pipeline's zero-pad/
    truncate rule exactly, so exported maps match what the model saw."""
    import numpy as np

    from vcr_tpu.evals.attention_export import _load_feats_padded

    short = np.arange(2 * 3, dtype=np.float16).reshape(2, 3)
    p = tmp_path / "short.npy"
    np.save(p, short)
    out = _load_feats_padded(str(p), 4)
    assert out.shape == (1, 4, 3) and out.dtype == np.float32
    np.testing.assert_array_equal(out[0, :2], short.astype(np.float32))
    np.testing.assert_array_equal(out[0, 2:], 0.0)

    long = np.random.default_rng(0).standard_normal((7, 3)).astype(np.float32)
    p2 = tmp_path / "long.npy"
    np.save(p2, long)
    out2 = _load_feats_padded(str(p2), 4)
    assert out2.shape == (1, 4, 3)
    np.testing.assert_array_equal(out2[0], long[:4])


def test_extract_video_feats_resnet_path(tmp_path):
    """Offline CNN feature extraction end-to-end on a synthetic clip:
    cv2 decode -> preprocess -> linspace subsample -> jitted JAX ResNet
    (random init, warned) -> feats/<vid>.npy with only the real-frame rows.
    Reference: data/extract_video_feats.py:71-120."""
    cv2 = pytest.importorskip("cv2")
    from vcr_tpu.data.prep.video_feats import extract_video_feats

    clips_dir = tmp_path / "data" / "msvd" / "clips"
    os.makedirs(clips_dir)
    w = cv2.VideoWriter(str(clips_dir / "vidA.avi"),
                        cv2.VideoWriter_fourcc(*"MJPG"), 5, (80, 60))
    for i in range(9):
        w.write(np.full((60, 80, 3), 20 * i, np.uint8))
    w.release()

    cfg = Config(data_dir=str(tmp_path / "data"), corpus="msvd",
                 num_frames=4, img_size=64, vision_arch="resnet18", seed=0)
    extract_video_feats(cfg)

    out = np.load(tmp_path / "data" / "msvd" / "feats" / "vidA.npy")
    assert out.shape == (4, 512) and out.dtype == np.float32
    assert np.isfinite(out).all()

    cfg_short = cfg.replace(num_frames=16)  # clip shorter than num_frames:
    extract_video_feats(cfg_short)          # only real frames are saved
    out2 = np.load(tmp_path / "data" / "msvd" / "feats" / "vidA.npy")
    assert out2.shape == (9, 512)

    with pytest.raises(NotImplementedError):
        extract_video_feats(cfg.replace(vision_arch="alexnet"))


def test_extract_video_feats_msvd_vgg_repackager(tmp_path):
    """The VGG fc7 CSV repackager: 4097-column rows keyed vidN_frame_M are
    grouped per video, frame-sorted (numerically, not lexically), linspace-
    subsampled, saved per-video. Reference: data/msvd_vgg/
    extract_video_feats.py:14-53 (incl. the 4097-column assert)."""
    from vcr_tpu.data.prep.video_feats import extract_video_feats_msvd_vgg

    corpus_dir = tmp_path / "data" / "msvd_vgg"
    os.makedirs(corpus_dir)
    rows = []
    # frame numbers deliberately out of order + >9 to catch lexical sorting
    for frame in (10, 2, 1, 30):
        rows.append(",".join([f"vid1_frame_{frame}"]
                             + [str(float(frame))] * 4096))
    rows.append(",".join(["vid2_frame_1"] + ["7.5"] * 4096))
    (corpus_dir / "yt_allframes_vgg_fc7_test.csv").write_text(
        "\n".join(rows) + "\n")

    cfg = Config(data_dir=str(tmp_path / "data"), corpus="msvd_vgg",
                 num_frames=3)
    extract_video_feats_msvd_vgg(cfg)

    v1 = np.load(corpus_dir / "feats" / "vid1.npy")
    assert v1.shape == (3, 4096)
    # sorted frame order is [1, 2, 10, 30]; linspace(0, 4, 3,
    # endpoint=False) -> rows 0, 1, 2 (reference subsampling semantics)
    np.testing.assert_array_equal(v1[:, 0], [1.0, 2.0, 10.0])
    v2 = np.load(corpus_dir / "feats" / "vid2.npy")
    assert v2.shape == (1, 4096) and (v2 == 7.5).all()

    bad = corpus_dir / "yt_allframes_vgg_fc7_bad.csv"
    bad.write_text("vid9_frame_1," + ",".join(["1.0"] * 2) + "\n")
    with pytest.raises(AssertionError):
        extract_video_feats_msvd_vgg(cfg)
