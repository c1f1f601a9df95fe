"""Unit tests for the logging window, StepTimer, StreamSampler, and config
serialization round-trips."""


from vcr_tpu.config import Config
from vcr_tpu.utils.logging import TrainLogger
from vcr_tpu.utils.profiling import StepTimer
from vcr_tpu.utils.sampler import StreamSampler


def test_logger_windowed_means(capsys):
    lg = TrainLogger(start_epoch=0, log_iter=3, log_dir=None)
    lg.set(["acc", "loss"])
    lg.step()
    for i in range(6):
        lg.update({"acc": float(i), "loss": float(10 + i)})
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "train_acc" in ln]
    assert len(lines) == 2  # two flushes at iters 3 and 6
    # first window mean of 0,1,2 = 1; second of 3,4,5 = 4
    assert "train_acc: 1.00000" in lines[0]
    assert "train_acc: 4.00000" in lines[1]
    assert lg.n_iter == 6


def test_step_timer_stats():
    t = StepTimer()
    t.tick()
    for _ in range(5):
        t.tick()
    s = t.summary()
    assert s["steps"] == 5
    assert s["step_ms_p95"] >= 0 and s["step_ms_mean"] >= 0


def test_stream_sampler_reservoir():
    s = StreamSampler(3, seed=0)
    for i in range(100):
        s.add(i)
    kept = s.get()
    assert len(kept) == 3
    # would_accept consistent with the kept set's worst key
    worst = s.samples[-1][0]
    assert s.would_accept(worst * 0.5)
    assert not s.would_accept(worst * 1.5 + 1e-9)


def test_config_roundtrip():
    cfg = Config(arch="s2vt-att", lr=3e-4, mesh_dp=4, vocab_pad_to=128,
                 schedule_sample=True)
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg
    # unknown keys in old checkpoints are ignored
    d = cfg.to_dict()
    d["legacy_flag"] = 1
    assert Config.from_dict(d) == cfg


def test_logger_raises_on_nonfinite_loss():
    import numpy as np
    import pytest

    from vcr_tpu.utils.logging import TrainLogger

    lg = TrainLogger(start_epoch=0, log_iter=2, log_dir=None)
    lg.set(["loss"])
    lg.update({"loss": np.float32(1.0)})
    with pytest.raises(FloatingPointError, match="non-finite"):
        lg.update({"loss": np.float32("nan")})


def test_step_timer_stats():
    import time

    from vcr_tpu.utils.profiling import StepTimer

    t = StepTimer()
    assert t.summary() == {}  # no ticks yet
    for _ in range(4):
        t.tick()
        time.sleep(0.002)
    s = t.summary()
    assert s["steps"] == 3  # N ticks -> N-1 intervals
    assert s["step_ms_mean"] >= 2.0
    assert s["step_ms_p50"] <= s["step_ms_p95"] * 1.0001
    t.reset()
    assert t.summary() == {}


def test_trace_noop_without_dir(monkeypatch):
    from vcr_tpu.utils.profiling import annotate, trace

    monkeypatch.delenv("VCR_TRACE_DIR", raising=False)
    with trace():     # no trace dir: must be a no-op, not an error
        with annotate("span"):
            pass
