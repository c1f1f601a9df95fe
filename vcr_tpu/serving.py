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

from vcr_tpu.models import base as model_base
from vcr_tpu.models import (rationale, resnet, s2vt, s2vt_att, spatial,
                            transformer, vgg)


def resolve_eos_id(spec: model_base.ModelSpec, eos_id: int | None = None,
                   vocab=None) -> int:
    """Resolve the serving-decode end token (shared by build_captioner and
    export_serving.export_captioner): a passed ``vocab`` supplies eos_id and
    is cross-checked against ``spec.sos_id``; an explicit ``eos_id`` wins only
    if it agrees; neither defaults to ``spec.sos_id + 1`` (this repo's
    <sos> <eos> <pad> <unk> layout, vocab.SPECIAL_TOKENS)."""
    if vocab is not None:
        if vocab.sos_id != spec.sos_id:
            raise ValueError(
                f"vocab.sos_id={vocab.sos_id} != spec.sos_id={spec.sos_id}: "
                "this vocab does not match the model spec")
        if eos_id is not None and eos_id != vocab.eos_id:
            raise ValueError(
                f"explicit eos_id={eos_id} contradicts vocab.eos_id={vocab.eos_id}")
        eos_id = vocab.eos_id
    if eos_id is None:
        eos_id = spec.sos_id + 1
    return eos_id


def build_captioner(params, spec: model_base.ModelSpec,
                    featurizer: str = "vgg16",
                    feat_params=None,
                    rng=None,
                    beam_size: int = 1,
                    eos_id: int | None = None,
                    sample_temperature: float = 0.0,
                    sample_top_k: int = 0,
                    sample_top_p: float = 0.0,
                    vocab=None,
                    kv_cache: str | None = None,
                    decode_weights: str | None = None) -> Callable:
    """-> fn(frames (B, N, 3, S, S) normalized) -> tokens (B, L) int32.
    The returned fn is ALREADY jitted (params passed as a jit argument — see
    the note at the bottom); do not wrap it in jax.jit again or the weights
    become compile-time constants.

    Covers ALL FIVE model families (BASELINE.md config list):
    s2vt / s2vt-att / transformer decode greedily (the transformer takes its
    KV-cached serving decode, transformer.make_cached_stepper); rationale runs
    its hard-Gumbel frame selection (eval semantics, RationaleNet.py:49-53)
    with ``rng`` (default PRNGKey(0), see PARITY.md "Known deviations") before
    its wrapped captioner; spatial consumes YOLO grid features (B, N, F, K, K)
    — use featurizer='yolo' with darknet params to fuse the backbone, or feed
    precomputed bbox features with featurizer='none'.

    featurizer: 'vgg16' (fc7, 4096-d — msvd_vgg pipeline), 'resnet' (512-d
    pooled — msvd/msrvtt pipeline), 'yolo' (darknet get_feats grid — spatial
    pipeline; feat_params is the Darknet object), or 'none' (input is already
    features).

    beam_size > 1 switches every family to beam search and returns each
    item's best beam (the transformer uses its KV-cached fast beam,
    decode.transformer_beam_decode_fast); sample_temperature > 0 switches to
    temperature/top-k/top-p sampling (decode.sample_tokens) instead.
    ``kv_cache="int8"`` (transformer only) serves through quantized K/V
    caches — the same opt-in bounded-error mode as the continuous pool
    (ops/kvquant.py). ``decode_weights="int8"`` (transformer only) streams
    the decoder dense weights as per-output-channel int8 (ops/wquant.py) —
    composes with kv_cache.

    ``eos_id`` resolution: pass ``vocab`` (a vcr_tpu.vocab.Vocab) and its
    ``eos_id`` is used and cross-checked against ``spec.sos_id``; or pass
    ``eos_id`` explicitly; or (neither) it defaults to ``spec.sos_id + 1``,
    which is only correct for this repo's standard special layout
    <sos> <eos> <pad> <unk> (vocab.SPECIAL_TOKENS) — a silent wrong-decode
    trap for nonstandard vocabularies, hence the vocab path.
    """
    eos_id = resolve_eos_id(spec, eos_id, vocab)
    if featurizer in ("vgg16", "resnet"):
        assert feat_params is not None
        darknet_obj = None
    elif featurizer == "yolo":
        # feat_params is passed as a Darknet object; its weight pytree is
        # what actually rides through the jit (see make_caption_fn)
        assert feat_params is not None
        darknet_obj = feat_params
        feat_params = darknet_obj.params
    else:
        darknet_obj = None
    caption = make_caption_fn(spec, featurizer, darknet_obj, rng, beam_size,
                              eos_id, sample_temperature, sample_top_k,
                              sample_top_p, kv_cache=kv_cache,
                              decode_weights=decode_weights)
    # jit with params as an ARGUMENT: closing over them would bake every
    # weight into the compiled program as a constant — XLA then constant-folds
    # them (minutes of compile at real widths) and re-uploads them with the
    # executable (observed live: a 4096-wide transformer captioner took >8min
    # to compile through the device tunnel as constants vs ~90s as arguments).
    caption_jit = jax.jit(caption)
    return lambda frames_or_feats: caption_jit(params, feat_params,
                                               frames_or_feats)


def make_caption_fn(spec: model_base.ModelSpec,
                    featurizer: str = "none",
                    darknet_obj=None,
                    rng=None,
                    beam_size: int = 1,
                    eos_id: int | None = None,
                    sample_temperature: float = 0.0,
                    sample_top_k: int = 0,
                    sample_top_p: float = 0.0,
                    kv_cache: str | None = None,
                    decode_weights: str | None = None) -> Callable:
    """The PURE serving function ``caption(params, feat_params, frames)`` that
    ``build_captioner`` jits and ``export_serving.export_captioner``
    serializes to a StableHLO artifact. ``eos_id`` must already be resolved
    (``resolve_eos_id``); for featurizer='yolo' pass the Darknet OBJECT — its
    cfg-derived layer structure is static (closed over, it shapes the trace)
    while its weight pytree is what callers thread as ``feat_params``."""
    if eos_id is None:
        eos_id = spec.sos_id + 1
    if sample_temperature > 0 and beam_size > 1:
        # the same loud conflict ContinuousCaptioner raises: silently
        # sampling while meta/flags record beam_size=K would freeze an
        # artifact whose metadata lies about its decode
        raise ValueError("beam_size > 1 and sampling are mutually exclusive "
                         "(beam maximizes sequence log-prob; sampling draws "
                         "from it)")
    # featurize takes feat_params as an ARGUMENT (threaded through the
    # caller's jit) — closing over the backbone weights would bake them into
    # the compiled program as constants, the same minutes-of-constant-folding
    # trap documented for the captioner params in build_captioner
    if featurizer in ("vgg16", "resnet"):
        extract = (vgg.extract_fc7 if featurizer == "vgg16"
                   else resnet.extract_features)

        def featurize(fp, frames):
            b, n = frames.shape[:2]
            flat = frames.reshape(b * n, *frames.shape[2:])
            feats = extract(fp, flat, spec.cdtype)
            return feats.reshape(b, n, -1)
    elif featurizer == "yolo":
        assert darknet_obj is not None

        def featurize(fp, frames):
            b, n = frames.shape[:2]
            flat = frames.reshape(b * n, *frames.shape[2:])
            _, outputs, first_yolo = darknet_obj._trace(fp, flat, spec.cdtype,
                                                        True)
            assert first_yolo is not None, \
                "cfg has no yolo block — get_feats cut undefined (darknet.py)"
            feats = outputs[first_yolo - 2]                    # (B·N, F, K, K)
            return feats.reshape(b, n, *feats.shape[1:])
    elif featurizer == "none":
        featurize = lambda fp, x: x  # noqa: E731
    else:
        raise NotImplementedError(featurizer)

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def caption(params, fp, frames_or_feats: jax.Array) -> jax.Array:
        feats = featurize(fp, frames_or_feats)
        if sample_temperature > 0:
            # stochastic serving (decode.sample_tokens; fixed rng => the
            # returned fn stays deterministic per input, re-build with a new
            # rng to re-roll)
            from vcr_tpu import decode as vdecode
            return vdecode.sample_tokens(params, spec, feats.astype(spec.cdtype),
                                         eos_id, rng, sample_temperature,
                                         sample_top_k, sample_top_p)
        if beam_size > 1:
            from vcr_tpu import decode as vdecode
            feats = feats.astype(spec.cdtype)
            if spec.arch == "transformer":
                tokens, _ = vdecode.transformer_beam_decode_fast(
                    params, spec, feats, beam_size, eos_id,
                    kv_cache=kv_cache, decode_weights=decode_weights)
            else:
                tokens, _ = vdecode.decode_tokens(params, spec, feats, eos_id,
                                                  beam_size, rng=rng)
            return tokens[:, 0]                       # best beam per item
        if spec.arch == "s2vt":
            return s2vt.apply(params, spec, feats, train=False, emit="tokens")
        if spec.arch == "s2vt-att":
            return s2vt_att.apply(params, spec, feats, train=False,
                                  emit="tokens")
        if spec.arch == "transformer":
            feats = feats.astype(spec.cdtype)
            src_mask = transformer.create_masks_inp(feats)
            e_out = transformer.encode(params, spec, feats, src_mask,
                                       jax.random.PRNGKey(0), train=False)
            return transformer.decode_greedy_fast(
                params, spec, e_out, kv_cache=kv_cache,
                decode_weights=decode_weights)
        if spec.arch == "rationale":
            sel, _ = rationale.generator(params["gen"], spec,
                                         feats.astype(spec.cdtype), rng,
                                         train=False)
            cap = params["caption_net"]
            if spec.base_arch == "s2vt":
                return s2vt.apply(cap, spec, sel, train=False, emit="tokens")
            return s2vt_att.apply(cap, spec, sel, train=False, emit="tokens")
        if spec.arch == "spatial":
            tokens, _, _ = spatial.apply(params, spec, feats, train=False,
                                         emit="tokens")
            return tokens
        raise NotImplementedError(spec.arch)

    return caption
