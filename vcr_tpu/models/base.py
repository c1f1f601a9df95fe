"""Shared model machinery: the static ModelSpec and the arch registry."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class ModelSpec:
    """Hashable static model configuration (safe as a jit static arg).

    Mirrors the constructor args the reference threads into every model
    (train.py:94-102): glove dims, dropout, hidden, vid_feat_size, max_len —
    plus arch-specific extras (tau for RationaleNet, layer/head counts for the
    Transformer, base arch for Rationale/Spatial wrappers).
    """

    arch: str
    vocab_size: int
    embed_size: int
    hidden_size: int
    vid_feat_size: int
    max_len: int
    num_frames: int
    dropout_p: float
    sos_id: int
    compute_dtype: str = "bfloat16"
    # RationaleNet / SpatialNet
    tau: float = 1.0
    base_arch: str = "s2vt"
    # Transformer (reference hard-codes N=6, heads=8, train.py:100)
    tf_layers: int = 6
    tf_heads: int = 8
    # SpatialNet grid
    grid_size: int = 13
    # Pad the vocab axis of the embedding table / output projection up to a
    # multiple of this (128 = MXU lane width; also makes the vocab axis
    # divisible for mp sharding). Padded logit columns are masked to -1e9 so
    # they can never win argmax and contribute ~0 softmax mass — results match
    # the unpadded model to float tolerance. 1 = no padding (exact parity).
    vocab_pad_to: int = 1
    # Run encoder GRUs through the Pallas fused-sequence kernel
    # (vcr_tpu/ops/pallas_gru.py). On current TPU v5e it measures within noise
    # of the XLA scan at these dims, so it defaults off; kept as a first-class
    # switch for shapes where the kernel wins.
    use_pallas: bool = False

    @property
    def padded_vocab_size(self) -> int:
        m = self.vocab_pad_to
        return ((self.vocab_size + m - 1) // m) * m

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def with_(self, **kw) -> "ModelSpec":
        import dataclasses
        return dataclasses.replace(self, **kw)


def spec_from_config(cfg, vocab) -> ModelSpec:
    """Build a ModelSpec from a Config + Vocab (the two objects the reference
    passes to every model constructor)."""
    return ModelSpec(
        arch=cfg.arch,
        vocab_size=vocab.vocab_size,
        embed_size=vocab.embed_size,
        hidden_size=cfg.hidden_size,
        vid_feat_size=cfg.vid_feat_size,
        max_len=cfg.max_len,
        num_frames=cfg.num_frames,
        dropout_p=cfg.dropout_p,
        sos_id=vocab.sos_id,
        compute_dtype=cfg.compute_dtype,
        tau=cfg.tau,
        base_arch=cfg.arch if cfg.arch in ("s2vt", "s2vt-att") else "s2vt",
        tf_layers=cfg.tf_layers,
        tf_heads=cfg.tf_heads,
        vocab_pad_to=cfg.vocab_pad_to,
        use_pallas=cfg.use_pallas,
    )


_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}


def register(name: str, init_fn: Callable, apply_fn: Callable) -> None:
    _REGISTRY[name] = (init_fn, apply_fn)


def build_model(name: str) -> Tuple[Callable, Callable]:
    """-> (init_params, apply). Known names: s2vt, s2vt-att, transformer,
    rationale, spatial (reference arch whitelists: train.py:94-102,
    RationaleNet.py:73-78, SpatialNet.py:69-74)."""
    # import lazily to avoid cycles
    import vcr_tpu.models.s2vt  # noqa: F401
    import vcr_tpu.models.s2vt_att  # noqa: F401
    import vcr_tpu.models.transformer  # noqa: F401
    import vcr_tpu.models.rationale  # noqa: F401
    import vcr_tpu.models.spatial  # noqa: F401
    if name not in _REGISTRY:
        raise NotImplementedError(f"Unknown model architecture {name!r}")
    return _REGISTRY[name]
