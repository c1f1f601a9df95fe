"""Deployable serving artifacts: serialize the whole serving graph
(featurizer -> captioner -> decode) to a portable StableHLO artifact via
``jax.export``, next to the weights and metadata.

The reference has no deployment story at all — its only inference surfaces
are the in-training eval loop and eval_attention.py (SURVEY §3.5). A
``vcr_tpu`` serving artifact is a directory a serving host can load **without
the framework's model code** (only ``jax`` + ``numpy``):

    serving_fn.bin   jax.export serialization of
                     caption(weight_leaves, frames) -> tokens
    weights.npz      the flattened weight leaves, in call order
                     (keys w00000, w00001, ...; non-numpy dtypes such as
                     bfloat16 stored as float32 and cast back per meta)
    meta.json        spec fields, eos_id, decode mode, input signature,
                     leaf dtypes, jax version

Framework-free loading recipe (what ``load_artifact`` does):

    from jax import export
    exp = export.deserialize(open("serving_fn.bin", "rb").read())
    w = numpy.load("weights.npz")
    leaves = [w[k] for k in sorted(w.files)]     # + per-leaf dtype cast
    tokens = exp.call(leaves, frames)

The batch dimension is exported SYMBOLICALLY by default
(``jax.export.symbolic_shape``) so one artifact serves any batch size; pass
``batch_size=N`` to pin it if a decode path ever rejects symbolic shapes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

FORMAT_VERSION = 1
GRAPH_FILE = "serving_fn.bin"
WEIGHTS_FILE = "weights.npz"
META_FILE = "meta.json"

# dtypes np.savez cannot round-trip; stored as float32 + cast back on load
_NONPORTABLE_DTYPES = ("bfloat16",)


def default_input_shape(spec, featurizer: str,
                        image_size: int = 224) -> Tuple[int, ...]:
    """Per-item input shape (sans batch) the serving graph expects:
    precomputed features for featurizer='none' ((N, V), or the YOLO grid
    (N, F, K, K) for SpatialNet), raw normalized frames (N, 3, S, S) when a
    backbone is fused in (serving.build_captioner's contract)."""
    if featurizer == "none":
        if spec.arch == "spatial":
            return (spec.num_frames, spec.vid_feat_size, spec.grid_size,
                    spec.grid_size)
        return (spec.num_frames, spec.vid_feat_size)
    return (spec.num_frames, 3, image_size, image_size)


def export_captioner(params, spec, out_dir: str,
                     featurizer: str = "none",
                     feat_params=None,
                     beam_size: int = 1,
                     eos_id: Optional[int] = None,
                     vocab=None,
                     rng=None,
                     sample_temperature: float = 0.0,
                     sample_top_k: int = 0,
                     sample_top_p: float = 0.0,
                     batch_size: Optional[int] = None,
                     input_shape: Optional[Sequence[int]] = None,
                     image_size: int = 224,
                     platforms: Optional[Sequence[str]] = None,
                     dp: int = 1,
                     kv_cache: Optional[str] = None,
                     decode_weights: Optional[str] = None) -> str:
    """Serialize the serving captioner for (params, spec) into ``out_dir``.

    Mirrors ``serving.build_captioner``'s surface (all five families, greedy /
    beam / sampled, fused featurizers); ``batch_size=None`` (default) exports
    a symbolic batch dimension. ``platforms`` (e.g. ``("cpu", "tpu")``) lowers
    one artifact for several backends — the CLI exports cpu+tpu so the same
    directory serves on a TPU host and replays in CPU CI.

    ``dp > 1`` exports a MULTI-CHIP artifact: the batch axis is sharded over a
    dp-way ``("dp", "mp")`` mesh (weights replicated — these models are small;
    serving scale-out is data parallel) and GSPMD partitions the whole graph.
    The serving host must load it with >= dp devices (``load_artifact``
    rebuilds the mesh from the metadata); a symbolic batch then means "any
    multiple of dp". Returns ``out_dir``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from vcr_tpu import serving

    eos_id = serving.resolve_eos_id(spec, eos_id, vocab)
    # Portability: a use_pallas trace would bake either interpret-mode Pallas
    # (exported from a non-TPU host) or a TPU-only mosaic call (breaking the
    # artifact's cpu lowering) into the graph. The kernel is a compute-path
    # switch over IDENTICAL params/math (ModelSpec.use_pallas), so export the
    # pure-XLA path unconditionally.
    if getattr(spec, "use_pallas", False):
        spec = spec.with_(use_pallas=False)
    darknet_obj = None
    if featurizer == "yolo":
        assert feat_params is not None, "yolo featurizer needs the Darknet"
        darknet_obj = feat_params
        feat_params = darknet_obj.params
    elif featurizer in ("vgg16", "resnet"):
        assert feat_params is not None
    caption = serving.make_caption_fn(spec, featurizer, darknet_obj, rng,
                                      beam_size, eos_id, sample_temperature,
                                      sample_top_k, sample_top_p,
                                      kv_cache=kv_cache,
                                      decode_weights=decode_weights)

    # Flatten (captioner weights, featurizer weights) into ONE ordered leaf
    # list: a list-of-arrays pytree is reconstructible from an .npz by key
    # order alone, so the loader needs no treedef (and no pickle).
    leaves, treedef = jax.tree_util.tree_flatten((params, feat_params))

    def flat_fn(weight_leaves, frames):
        p, fp = jax.tree_util.tree_unflatten(treedef, weight_leaves)
        return caption(p, fp, frames)

    item_shape = tuple(input_shape) if input_shape is not None else \
        default_input_shape(spec, featurizer, image_size)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        frames_shape: Tuple = ((dp * b if dp > 1 else b), *item_shape)
    else:
        if dp > 1 and int(batch_size) % dp != 0:
            raise ValueError(f"batch_size={batch_size} not divisible by dp={dp}")
        frames_shape = (int(batch_size), *item_shape)
    frames_sds = jax.ShapeDtypeStruct(frames_shape, jnp.float32)
    leaf_sds = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]

    jit_kw = {}
    if dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vcr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp, 1)
        rep = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("dp", *([None] * len(item_shape))))
        jit_kw["in_shardings"] = ([rep] * len(leaves), batch_sh)

    try:
        exported = jexport.export(
            jax.jit(flat_fn, **jit_kw),
            platforms=tuple(platforms) if platforms else None,
        )(leaf_sds, frames_sds)
    except Exception as e:
        if batch_size is None:
            raise RuntimeError(
                "symbolic-batch export failed for this decode path; retry "
                f"with an explicit batch_size (underlying error: {e})") from e
        raise

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, GRAPH_FILE), "wb") as f:
        f.write(exported.serialize())
    _save_leaves(os.path.join(out_dir, WEIGHTS_FILE), leaves)
    meta = {
        "format_version": FORMAT_VERSION,
        "spec": dataclasses.asdict(spec),
        "featurizer": featurizer,
        "eos_id": int(eos_id),
        "beam_size": int(beam_size),
        "sample_temperature": float(sample_temperature),
        "sample_top_k": int(sample_top_k),
        "sample_top_p": float(sample_top_p),
        "input_item_shape": list(item_shape),
        "batch": "symbolic" if batch_size is None else int(batch_size),
        "num_weight_leaves": len(leaves),
        "leaf_dtypes": [str(np.dtype(l.dtype)) for l in leaves],
        "dp": int(dp),
        "nr_devices": int(exported.nr_devices),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "output": "tokens (B, max_len) int32",
    }
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def _save_leaves(path: str, leaves) -> None:
    """npz with zero-padded ordinal keys (sorted(files) == call order).
    bfloat16 is not a numpy-portable dtype: stored as float32, cast back on
    load per meta['leaf_dtypes']."""
    arrays = {}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        if str(a.dtype) in _NONPORTABLE_DTYPES:
            a = a.astype(np.float32)
        arrays[f"w{i:05d}"] = a
    np.savez(path, **arrays)


def _load_leaves(path: str, leaf_dtypes) -> list:
    import jax.numpy as jnp

    w = np.load(path)
    keys = sorted(w.files)
    assert len(keys) == len(leaf_dtypes), \
        f"weights.npz has {len(keys)} leaves, meta says {len(leaf_dtypes)}"
    out = []
    for k, dt in zip(keys, leaf_dtypes):
        a = w[k]
        if str(a.dtype) != dt:
            a = jnp.asarray(a).astype(dt)
        out.append(a)
    return out


class ServingArtifact:
    """A loaded artifact: ``caption(frames) -> tokens (B, max_len) int32``.

    Uses only jax + numpy — no vcr_tpu model code runs at serving time; the
    whole graph (featurizer included) replays from the StableHLO payload.
    Multi-chip artifacts (meta['dp'] > 1) shard the batch axis over the mesh
    built at load time and require batch % dp == 0.
    """

    def __init__(self, exported, leaves, meta, mesh=None):
        import jax

        self._exported = exported
        # device_put ONCE at load: leaving the weight leaves as host numpy
        # would re-transfer the full weight set on every caption() dispatch
        # (seconds per request for real-width models through a slow link)
        self._leaves = [jax.device_put(l) for l in leaves]
        self.meta = meta
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._leaves = [jax.device_put(l, rep) for l in leaves]
            ndim_item = len(meta["input_item_shape"])
            self._batch_sharding = NamedSharding(
                mesh, P("dp", *([None] * ndim_item)))

    @property
    def exported(self):
        """The underlying ``jax.export.Exported`` — callable inside jit
        (``artifact.exported.call(artifact.leaves, frames)``), which is how
        bench_all times the replayed graph with the chained-iteration
        discipline."""
        return self._exported

    @property
    def leaves(self):
        """The weight leaves in call order (placed on the mesh for dp>1)."""
        return self._leaves

    def caption(self, frames) -> np.ndarray:
        frames = np.asarray(frames, dtype=np.float32)
        want = self.meta["input_item_shape"]
        if list(frames.shape[1:]) != want:
            raise ValueError(
                f"frames shape {frames.shape} does not match the artifact's "
                f"per-item signature {want}")
        b = self.meta["batch"]
        if b != "symbolic" and frames.shape[0] != b:
            raise ValueError(
                f"artifact was exported at fixed batch {b}, got "
                f"{frames.shape[0]}")
        dp = self.meta.get("dp", 1)
        if dp > 1:
            import jax

            if frames.shape[0] % dp != 0:
                raise ValueError(
                    f"multi-chip artifact (dp={dp}) needs batch % dp == 0, "
                    f"got {frames.shape[0]}")
            frames = jax.device_put(frames, self._batch_sharding)
        return np.asarray(self._exported.call(self._leaves, frames))

    __call__ = caption


def load_artifact(artifact_dir: str, devices=None) -> ServingArtifact:
    """Load an artifact directory. Multi-chip artifacts rebuild a dp-way mesh
    from ``devices`` (default ``jax.devices()``) — the host must have at least
    meta['nr_devices'] of them."""
    from jax import export as jexport

    with open(os.path.join(artifact_dir, META_FILE)) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported artifact format_version={meta.get('format_version')}"
            f" (this loader understands {FORMAT_VERSION})")
    with open(os.path.join(artifact_dir, GRAPH_FILE), "rb") as f:
        exported = jexport.deserialize(f.read())
    leaves = _load_leaves(os.path.join(artifact_dir, WEIGHTS_FILE),
                          meta["leaf_dtypes"])
    mesh = None
    if meta.get("dp", 1) > 1:
        import jax
        from jax.experimental import mesh_utils
        from jax.sharding import Mesh

        dp = meta["dp"]
        devices = list(devices) if devices is not None else jax.devices()
        if len(devices) < dp:
            raise ValueError(
                f"multi-chip artifact needs {dp} devices, host has "
                f"{len(devices)}")
        arr = mesh_utils.create_device_mesh((dp, 1), devices=devices[:dp])
        mesh = Mesh(arr, axis_names=("dp", "mp"))
    return ServingArtifact(exported, leaves, meta, mesh=mesh)
