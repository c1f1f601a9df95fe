"""Device mesh + sharding layout for SPMD training (dp × mp).

The reference is strictly single-GPU (SURVEY.md §2: torch.nn.parallel imported
but never used; no torch.distributed anywhere) — parallelism here is new,
TPU-native capability:

* **dp** (data parallel): the batch's leading axis is sharded across dp;
  GSPMD inserts the gradient all-reduce over ICI automatically once the loss
  reduces over the sharded batch axis.
* **mp** (tensor parallel): each captioner's vocabulary projection — by far
  the largest matmul, (B·L, H) @ (H, V) with V ≈ corpus vocab — is sharded
  column-wise (w: P(None, 'mp'), b: P('mp')); logits come out sharded over the
  vocab axis and the CE's log-softmax reduction triggers the psum over mp.
  The GloVe embedding table is sharded over mp rows the same way.

Sharding is *by placement*: params/opt_state/batches are device_put with
NamedShardings and the jitted step functions simply inherit them, so the same
step code runs 1-chip or N-chip unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Parameter leaves whose *parent* module is a vocab-sized projection.
_VOCAB_PROJ_MODULES = ("linear", "pred_linear")


def make_mesh(dp: int, mp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Create a (dp, mp) mesh. ICI-contiguous layout via mesh_utils when using
    the default device list."""
    if devices is None:
        devices = jax.devices()
    n = dp * mp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = mesh_utils.create_device_mesh((dp, mp), devices=devices[:n])
    return Mesh(arr, axis_names=("dp", "mp"))


def _param_spec(path, leaf, vocab_size: int, mp: int = 1) -> P:
    """Sharding rule for one param leaf. Vocab-sized output projections and the
    embedding table split over mp; everything else is replicated (these models
    are small — H=512 — so replication is the right call for all non-vocab
    weights). A vocab axis not divisible by mp (e.g. an unpadded vocab loaded
    from a checkpoint) falls back to replication rather than erroring — set
    vocab_pad_to to a multiple of mp to actually shard."""
    if vocab_size % max(mp, 1) != 0:
        return P()
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if len(names) >= 2 and names[-2] in _VOCAB_PROJ_MODULES:
        if names[-1] == "w" and leaf.ndim == 2 and leaf.shape[-1] == vocab_size:
            return P(None, "mp")
        if names[-1] == "b" and leaf.ndim == 1 and leaf.shape[0] == vocab_size:
            return P("mp")
    if names and names[-1] == "table" and leaf.ndim == 2 and leaf.shape[0] == vocab_size:
        return P("mp", None)
    return P()


def shard_params(params, mesh: Mesh, vocab_size: int):
    """device_put each param leaf with its NamedSharding."""
    mp = mesh.shape.get("mp", 1)
    if mp > 1 and vocab_size % mp != 0:
        import warnings

        warnings.warn(
            f"padded vocab {vocab_size} is not divisible by mesh_mp={mp}: "
            "vocab projection/embedding fall back to REPLICATION (no mp "
            "sharding, no memory saving). Set vocab_pad_to to a multiple of "
            "mesh_mp to shard.", stacklevel=2)

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _param_spec(path, leaf,
                                                                    vocab_size,
                                                                    mp)))
    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_rows(garr) -> np.ndarray:
    """This process's rows of a leading-axis (dp-)sharded global array, in
    global row order. Pure host-side shard reads — no collective, safe to call
    from any thread. With mp>1 each row block is replicated across mp shards;
    duplicates are dropped. On a fully-addressable array this returns the
    whole array (single-process: identity up to a copy)."""
    shards = sorted(((s.index[0].start or 0, s.data)
                     for s in garr.addressable_shards), key=lambda t: t[0])
    rows, seen = [], set()
    for start, data in shards:
        if start in seen:  # mp replica of the same row block
            continue
        # the dedup-by-row-start logic is only sound when shards span the
        # full non-leading extent; a leaf sharded on a trailing axis would
        # silently lose columns here — make that loud instead
        assert data.shape[1:] == garr.shape[1:], (
            f"local_rows needs leading-axis-only sharding; got shard "
            f"{data.shape} of global {garr.shape}")
        seen.add(start)
        rows.append(np.asarray(data))
    return np.concatenate(rows, axis=0)


def gather_global_rows(local: np.ndarray) -> np.ndarray:
    """Concatenate each process's ``local`` rows into the full global array
    (process-order blocks), returned on host to EVERY process. Collective —
    all processes must call in lockstep with identically-shaped inputs.
    Single-process: identity."""
    if jax.process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(local, tiled=True))


def shard_batch(batch, mesh: Mesh):
    """Shard array fields over dp on the leading (batch) axis.

    Multi-host aware: with one process a plain device_put suffices, but on a
    real multi-host slice each process only holds ITS rows of the global
    batch, and device_put of process-local data with a global NamedSharding
    is invalid — jax.make_array_from_process_local_data assembles the global
    array from per-process rows instead (global batch = process_count x
    per-process rows; the input pipeline gives each process a disjoint sample
    shard and keeps batch counts in lockstep, data/pipeline.py)."""
    nproc = jax.process_count()

    def place(x):
        x = np.asarray(x)
        spec = P("dp", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        sh = NamedSharding(mesh, spec)
        if nproc == 1:
            return jax.device_put(x, sh)
        global_shape = (x.shape[0] * nproc, *x.shape[1:])
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return {k: place(v) for k, v in batch.items()}
