"""End-to-end serving: raw frames -> featurizer -> captioner -> tokens, as one
jittable function (the BASELINE.md north-star pipeline: "raw frames -> caption,
end-to-end").

Note the reference never runs a CNN at caption time — its captions/sec is also
features->caption with features precomputed offline (SURVEY §3.5). This module
goes further and fuses the featurizer into the serving graph so fresh videos
caption in one device round trip.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from vcr_tpu.models import base as model_base
from vcr_tpu.models import resnet, s2vt, s2vt_att, vgg


def build_captioner(params, spec: model_base.ModelSpec,
                    featurizer: str = "vgg16",
                    feat_params=None) -> Callable:
    """-> fn(frames (B, N, 3, S, S) normalized) -> tokens (B, L) int32.

    featurizer: 'vgg16' (fc7, 4096-d — msvd_vgg pipeline), 'resnet' (512-d
    pooled — msvd/msrvtt pipeline), or 'none' (input is already features).
    """
    if featurizer == "vgg16":
        assert feat_params is not None

        def featurize(frames):
            b, n = frames.shape[:2]
            flat = frames.reshape(b * n, *frames.shape[2:])
            feats = vgg.extract_fc7(feat_params, flat, spec.cdtype)
            return feats.reshape(b, n, -1)
    elif featurizer == "resnet":
        assert feat_params is not None

        def featurize(frames):
            b, n = frames.shape[:2]
            flat = frames.reshape(b * n, *frames.shape[2:])
            feats = resnet.extract_features(feat_params, flat, spec.cdtype)
            return feats.reshape(b, n, -1)
    elif featurizer == "none":
        featurize = lambda x: x  # noqa: E731
    else:
        raise NotImplementedError(featurizer)

    cap = s2vt if spec.arch == "s2vt" else s2vt_att

    def caption(frames_or_feats: jax.Array) -> jax.Array:
        feats = featurize(frames_or_feats)
        if spec.arch == "s2vt":
            return cap.apply(params, spec, feats, train=False, emit="tokens")
        logits = cap.apply(params, spec, feats, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return caption
