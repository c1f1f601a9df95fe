"""Model zoo: s2vt, s2vt_att, transformer, rationale, spatial, darknet, resnet.

Every captioner exposes the same functional interface:

    init_params(key, spec, glove_vectors)      -> params pytree
    apply(params, spec, vid_feats, s, s_len,
          rng=..., train=..., teacher_force_prob=...) -> logits (B, L, vocab)
                                                          (+ model-specific extras)

``spec`` is a hashable :class:`vcr_tpu.models.base.ModelSpec`, safe to pass as a
static argument to jit/pjit.
"""

from vcr_tpu.models.base import ModelSpec, build_model, spec_from_config  # noqa: F401
