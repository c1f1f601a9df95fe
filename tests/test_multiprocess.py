"""True multi-PROCESS data-parallel training (VERDICT r2 "Next round" #4).

Everything multi-host in the framework (mesh.shard_batch's
make_array_from_process_local_data branch, BatchIterator's strided shards +
lockstep padding, the eval-time allgather of token ids, process-0 checkpoint
writes) is exercised here for real: two OS processes, each with 4 virtual CPU
devices, joined by jax.distributed.initialize into one 8-device dp mesh — the
same multi-controller topology as a 2-host TPU pod slice, minus the ICI.

Equality argument vs the single-process comparison run: the shuffled order is
one seeded permutation; shard p takes order[p::2], so the union of the two
shards' batch k equals the single-process (2x bsize) batch k as a SET, and the
masked per-sample-mean loss plus its gradient are permutation-invariant within
a batch. One caption per video makes caption choice deterministic. Both runs
therefore produce the same update sequence up to fp reduction order.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
pid, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
dp, mp = int(sys.argv[4]), int(sys.argv[5])
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8
from test_train_loop import tiny_config
from vcr_tpu.train.loop import train

cfg = tiny_config(tmp, epochs=2, dropout_p=0.0, bsize=4, nworkers=0,
                  mesh_dp=dp, mesh_mp=mp, vocab_pad_to=8,
                  save_path=os.path.join(tmp, "mp_models_%dx%d" % (dp, mp)))
m = train(cfg)
print("MPRESULT", json.dumps({{k: float(v) for k, v in m.items()}}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_two_process_training_matches_single_process(tmp_path, dp, mp):
    """dp=8: pure data parallel. dp=4,mp=2: the vocab projection/embedding
    shard ACROSS the two processes — exercising global device_put of
    cross-host-sharded params and the checkpoint save's allgather of
    non-addressable leaves."""
    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"), num_videos=12,
                 captions_per_video=1)

    # single-process comparison: same global batch (2 procs x bsize 4), same
    # 8-device mesh (the in-process suite already has 8 virtual devices)
    ref = train(tiny_config(tmp, epochs=2, dropout_p=0.0, bsize=8, nworkers=0,
                            mesh_dp=dp, mesh_mp=mp, vocab_pad_to=8,
                            save_path=os.path.join(tmp, "sp_models")))

    worker = os.path.join(tmp, "mp_worker.py")
    with open(worker, "w") as f:
        f.write(WORKER.format(repo=REPO))
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, worker, str(i), port, tmp,
                               str(dp), str(mp)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("MPRESULT ")]
        assert lines, f"no MPRESULT in worker output:\n{out[-4000:]}"
        results.append(json.loads(lines[-1][len("MPRESULT "):]))

    # both processes computed identical GLOBAL metrics (loss from the jitted
    # step over the global batch; METEOR/BLEU/CIDEr from the allgathered
    # global hyp set)
    for k in results[0]:
        assert results[0][k] == pytest.approx(results[1][k], abs=1e-12), k

    # and they match the single-process run to fp-reduction tolerance
    assert results[0]["loss"] == pytest.approx(ref["loss"], abs=1e-4)
    assert results[0]["acc"] == pytest.approx(ref["acc"], abs=1e-4)
    assert results[0]["METEOR"] == pytest.approx(ref["METEOR"], abs=1e-3)

    # process-0-only checkpoint write: latest + best exist exactly once, and
    # (mp=2) sharded-leaf allgather produced a full-value checkpoint that
    # loads standalone
    mp_models = os.path.join(tmp, f"mp_models_{dp}x{mp}")
    assert os.path.exists(os.path.join(mp_models, "model_latest", "meta.json"))
    assert os.path.exists(os.path.join(mp_models, "model_best", "meta.json"))
    from vcr_tpu.train import checkpoint as ckpt

    params_mp, _, _ = ckpt.load_checkpoint(os.path.join(mp_models, "model_best"))
    params_sp, _, _ = ckpt.load_checkpoint(os.path.join(tmp, "sp_models",
                                                        "model_best"))
    flat_mp = jax.tree_util.tree_leaves_with_path(params_mp)
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(params_sp))
    assert flat_mp and len(flat_mp) == len(flat_sp)
    for path, leaf in flat_mp:
        ref_leaf = flat_sp[path]
        assert leaf.shape == ref_leaf.shape, path
        np.testing.assert_allclose(np.asarray(leaf, np.float32),
                                   np.asarray(ref_leaf, np.float32),
                                   atol=5e-4, err_msg=str(path))


PREEMPT_WORKER = """
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
pid, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=2, process_id=pid)
from test_train_loop import tiny_config
from vcr_tpu.train.loop import train

print("WORKER_READY", flush=True)
cfg = tiny_config(tmp, epochs=500, dropout_p=0.0, bsize=4, nworkers=0,
                  mesh_dp=8, mesh_mp=1, vocab_pad_to=8,
                  save_path=os.path.join(tmp, "pre_models"))
train(cfg)
print("WORKER_EXIT_CLEAN", flush=True)
"""


def test_preemption_signal_on_one_host_stops_both(tmp_path):
    """A SIGTERM delivered to ONE host must stop the whole 2-process job
    cleanly: the signaled host's flag reaches the peer through the per-step
    preemption consensus (train loop _global_preempted), both exit at the
    same step boundary, and process 0 writes a resumable checkpoint —
    instead of the peer hanging in the next gradient all-reduce while the
    signaled host parks in the checkpoint collective."""
    import signal
    import time

    from tests.util_corpus import build_corpus

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"), num_videos=12,
                 captions_per_video=1)
    worker = os.path.join(tmp, "pre_worker.py")
    with open(worker, "w") as f:
        f.write(PREEMPT_WORKER.format(repo=REPO))
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, "-u", worker, str(i), port, tmp],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env) for i in range(2)]
    try:
        # let both processes get well into training, then SIGTERM ONLY proc 0
        deadline = time.time() + 300
        while time.time() < deadline:
            meta = os.path.join(tmp, "pre_models", "model_latest", "meta.json")
            if os.path.exists(meta):   # first epoch checkpoint written
                break
            if any(p.poll() is not None for p in procs):
                break
            time.sleep(1)
        procs[0].send_signal(signal.SIGTERM)
        outs = [p.communicate(timeout=300)[0] for p in procs]
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert "Preemption signal" in out, f"worker {i}:\n{out[-2000:]}"
    # the checkpoint written at the preemption boundary must be resumable
    from vcr_tpu.train import checkpoint as ckpt

    path = os.path.join(tmp, "pre_models", "model_latest")
    assert ckpt.checkpoint_exists(path)
    _, _, meta = ckpt.load_checkpoint(path)
    assert meta["n_iter"] > 0
