"""vcr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-captioning-with-rationale framework.

Re-implements, TPU-first, the full capability surface of the reference
``p-kar/pytorch-video-caption-rationale`` research codebase:

* S2VT, S2VT+attention and Transformer video captioners
  (reference: model/S2VTModel.py, model/S2VTAttModel.py, model/TransformerNet.py)
* RationaleNet (Gumbel-Softmax temporal rationales, reference: model/RationaleNet.py)
* SpatialNet (spatial attention over YOLO grid features, reference: model/SpatialNet.py)
* Darknet/YOLOv3 + ResNet featurizers (reference: model/darknet.py,
  data/extract_video_feats.py, data/extract_bbox_feats.py)
* Training loops with masked losses, scheduled sampling, METEOR/BLEU-4/CIDEr eval,
  Orbax checkpointing, tensorboard logging and a grid-sweep launcher.

Design stance (see SURVEY.md §7): pure functions over fixed-shape arrays,
``lax.scan`` for every recurrence, end-to-end ``jit``/``pjit`` over a
``jax.sharding.Mesh``, host work (tokenization, METEOR, tensorboard) kept outside
the step functions.
"""

__version__ = "0.1.0"

# Public API (lazy — importing vcr_tpu must not pull in jax et al.)
__all__ = ["Config", "Vocab", "train", "decode_tokens", "sample_tokens",
           "build_model", "ModelSpec", "build_captioner", "export_captioner",
           "load_artifact", "ContinuousCaptioner", "CaptionServer",
           "load_continuous", "CaptionClient", "MultiCaptionServer"]


def __getattr__(name):
    if name == "Config":
        from vcr_tpu.config import Config
        return Config
    if name == "Vocab":
        from vcr_tpu.vocab import Vocab
        return Vocab
    if name == "train":
        from vcr_tpu.train.loop import train
        return train
    if name in ("decode_tokens", "sample_tokens"):
        from vcr_tpu import decode
        return getattr(decode, name)
    if name in ("build_model", "ModelSpec"):
        from vcr_tpu.models import base
        return getattr(base, name)
    if name == "build_captioner":
        from vcr_tpu.serving import build_captioner
        return build_captioner
    if name in ("export_captioner", "load_artifact"):
        from vcr_tpu import export_serving
        return getattr(export_serving, name)
    if name == "ContinuousCaptioner":
        from vcr_tpu.serving_continuous import ContinuousCaptioner
        return ContinuousCaptioner
    if name == "CaptionServer":
        from vcr_tpu.server import CaptionServer
        return CaptionServer
    if name == "load_continuous":
        from vcr_tpu.export_continuous import load_continuous
        return load_continuous
    if name == "CaptionClient":
        from vcr_tpu.client import CaptionClient
        return CaptionClient
    if name == "MultiCaptionServer":
        from vcr_tpu.multiserver import MultiCaptionServer
        return MultiCaptionServer
    raise AttributeError(name)
