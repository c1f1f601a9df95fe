"""Orbax checkpointing with the reference's latest/best policy.

Reference behavior (train.py:180-205): every epoch save a dict {epoch,
state_dict, optimizer, n_iter, opts, val_meteor_score, best_val_meteor_score}
to model_latest.net, and to model_best.net when val METEOR >= best.

TPU-native version: Orbax PyTree checkpoints of {params, opt_state} plus a JSON
sidecar of {epoch, n_iter, config, val_meteor_score, best_val_meteor_score}.
Two deliberate fixes over the reference (pure infra defects, SURVEY.md §5):
* optimizer state IS restored on resume (the reference saved it but never
  loaded it, train.py:126-134);
* resume still adopts the checkpointed config, matching train.py:133.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


def _tree_path(path: str) -> str:
    return os.path.join(os.path.abspath(path), "tree")


def _meta_path(path: str) -> str:
    return os.path.join(os.path.abspath(path), "meta.json")


def save_checkpoint(path: str, params, opt_state, meta: Dict[str, Any]) -> None:
    """Write {params, opt_state} + metadata to ``path`` (a directory).

    CRASH-ATOMIC: the checkpoint is fully written to a sibling ``.tmp`` dir
    first and swapped in with directory renames. Orbax's ``force=True``
    overwrite deletes the previous tree BEFORE writing the new one, so a kill
    mid-save used to leave a stale meta.json with no tree — an unreadable
    "latest" that broke resume (observed live in round-2 verification). Any
    kill now leaves either the old complete checkpoint, the new complete one,
    or old preserved under ``.old`` (which load/resume fall back to)."""
    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"

    # Multi-host: every process calls this in lockstep (the train loop's
    # save sites are unconditional). Leaves sharded ACROSS processes are
    # allgathered to full host values; then only process 0 touches the
    # filesystem, with a device barrier so no peer proceeds (e.g. into a
    # resume-read) before the swap is durable.
    import jax

    multihost = jax.process_count() > 1
    if multihost:
        tree = _host_tree({"params": params, "opt_state": opt_state})
    else:
        tree = {"params": params, "opt_state": opt_state}
    err: Exception | None = None
    if not multihost or jax.process_index() == 0:
        try:
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp, exist_ok=True)
            # active_processes={0}: the tree is already full host numpy, so
            # process 0 writes alone and orbax's internal barriers must not
            # wait on the peers (they are parked at the broadcast below, not
            # in orbax).
            kw = {}
            if multihost:
                from orbax.checkpoint.options import MultiprocessingOptions

                kw["multiprocessing_options"] = MultiprocessingOptions(
                    primary_host=0, active_processes={0})
            with ocp.StandardCheckpointer(**kw) as ckptr:
                ckptr.save(_tree_path(tmp), tree, force=True)
            with open(_meta_path(tmp), "w") as f:
                json.dump(meta, f, indent=2, default=str)
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(path):
                os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        except Exception as e:  # noqa: BLE001 — must reach the broadcast
            if not multihost:
                raise
            err = e
    if multihost:
        # Synchronization AND failure propagation in one collective: if the
        # writer died (disk full, permissions) the peers must raise too, not
        # park forever in a barrier the writer never reaches — a write error
        # becomes a coherent job failure instead of a cluster-wide hang.
        from jax.experimental import multihost_utils

        import numpy as _np

        ok = multihost_utils.broadcast_one_to_all(
            _np.asarray(err is None, _np.int32))
        if err is not None:
            raise err
        if not bool(ok):
            raise RuntimeError(
                f"checkpoint write failed on process 0 for {path} "
                "(see its log for the underlying error)")


def _host_tree(tree):
    """Materialize every leaf as a full host numpy array. Cross-process
    sharded leaves (not fully addressable) are reassembled with an allgather
    — a collective, so all processes must walk the identical tree."""
    import jax
    import numpy as np

    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                # replicated over the global mesh: any local replica IS the
                # full value — no collective needed
                return np.asarray(next(iter(x.addressable_shards)).data)
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


def _complete(path: str) -> bool:
    """A checkpoint is loadable iff both the orbax tree and the meta exist."""
    return os.path.exists(_tree_path(path)) and os.path.exists(_meta_path(path))


def _resolve(path: str) -> str:
    """Pick the newest COMPLETE variant of a checkpoint dir: the dir itself,
    else its ``.old`` (a kill between the two swap renames), else itself (so
    the caller's error names the primary path)."""
    path = os.path.abspath(path)
    if _complete(path):
        return path
    if _complete(path + ".old"):
        return path + ".old"
    return path


def load_checkpoint(path: str, template_params=None, template_opt_state=None
                    ) -> Tuple[Any, Any, Dict[str, Any]]:
    """Restore (params, opt_state, meta). Templates (matching pytrees of
    arrays) let orbax rebuild exotic containers (optax NamedTuple states) and
    place arrays on the right shardings; without them the raw stored tree
    (nested dicts/lists) is returned — fine for params-only consumers."""
    path = _resolve(path)
    if template_params is not None:
        with ocp.StandardCheckpointer() as ckptr:
            template = {"params": template_params, "opt_state": template_opt_state}
            tree = ckptr.restore(_tree_path(path), template)
    else:
        # Device-agnostic raw restore: without a template orbax replays the
        # SAVED shardings, which fails when the checkpoint was written on a
        # different device type (e.g. trained on TPU, decoded on a CPU-only
        # host). Restoring as numpy sidesteps device placement entirely;
        # consumers device_put as needed.
        import jax
        import numpy as _np

        with ocp.PyTreeCheckpointer() as ckptr:
            meta_tree = ckptr.metadata(_tree_path(path)).item_metadata.tree
            restore_args = jax.tree_util.tree_map(
                lambda _m: ocp.RestoreArgs(restore_type=_np.ndarray), meta_tree)
            tree = ckptr.restore(
                _tree_path(path),
                args=ocp.args.PyTreeRestore(restore_args=restore_args))
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    return tree["params"], tree["opt_state"], meta


def peek_meta(path: str) -> Optional[Dict[str, Any]]:
    """Read just the JSON sidecar of a checkpoint (no tree IO) — lets resume
    adopt the embedded config BEFORE building the model, so `--resume true`
    needs only I/O flags, same as eval/decode."""
    path = _resolve(path)
    if not _complete(path):
        return None
    with open(_meta_path(path)) as f:
        return json.load(f)


def latest_path(save_path: str) -> str:
    return os.path.join(save_path, "model_latest")


def best_path(save_path: str) -> str:
    return os.path.join(save_path, "model_best")


def checkpoint_exists(path: str) -> bool:
    return _complete(_resolve(path))


class CheckpointManager:
    """Latest/best policy driver (train.py:180-205 semantics)."""

    def __init__(self, save_path: str):
        self.save_path = save_path
        os.makedirs(save_path, exist_ok=True)

    def save_epoch(self, params, opt_state, epoch: int, n_iter: int,
                   config_dict: Dict, val_meteor: float, best_meteor: float,
                   is_best: bool) -> None:
        meta = {
            "epoch": epoch,
            "n_iter": n_iter,
            "config": config_dict,
            "val_meteor_score": val_meteor,
            "best_val_meteor_score": best_meteor,
        }
        if is_best:
            save_checkpoint(best_path(self.save_path), params, opt_state, meta)
        save_checkpoint(latest_path(self.save_path), params, opt_state, meta)

    def try_resume(self, params, opt_state) -> Optional[Tuple[Any, Any, Dict]]:
        p = latest_path(self.save_path)
        found = checkpoint_exists(p)
        import jax

        if jax.process_count() > 1:
            # Checkpoints are written by process 0 only; resume therefore
            # REQUIRES save_path on a filesystem all hosts share. If hosts
            # disagree on existence (or on which step the checkpoint holds),
            # they would run divergent epoch/step sequences and deadlock in
            # the first mismatched collective — fail fast with the cause
            # instead.
            import numpy as _np
            from jax.experimental import multihost_utils

            n_iter = -1
            if found:
                with open(_meta_path(_resolve(p))) as f:
                    n_iter = int(json.load(f).get("n_iter", 0))
            states = multihost_utils.process_allgather(
                _np.asarray([int(found), n_iter], _np.int64))
            if len({tuple(s) for s in _np.asarray(states).reshape(-1, 2)}) > 1:
                raise RuntimeError(
                    "multi-host resume state differs across processes "
                    f"(found/n_iter per process: {_np.asarray(states).tolist()}). "
                    "--save_path must live on a filesystem shared by every "
                    "host (checkpoints are written by process 0 only).")
        if not found:
            return None
        return load_checkpoint(p, params, opt_state)
