"""clipself_tpu — a TPU-native (JAX/Flax/Pallas/pjit) framework for CLIP
self-distillation and open-vocabulary dense prediction.

Re-designed from scratch for TPU hardware with the capabilities of the
reference CLIPSelf stack (an OpenCLIP fork; see SURVEY.md): the EVA-CLIP
vision transformer with dense-feature extraction, the CLIPSelf / RegionCLIP
training methods, COCO data pipelines, the zero-shot region-classification
evaluator, and checkpoint interop.
"""

__version__ = "0.1.0"

from clipself_tpu.core.config import (  # noqa: F401
    CLIPConfig,
    TextConfig,
    VisionConfig,
    get_model_config,
    list_models,
)


def __getattr__(name):
    # lazy top-level entry points (mirrors the reference's open_clip API
    # surface) without importing jax/flax at package import
    if name in ("create_model", "create_model_and_transforms", "get_tokenizer"):
        from clipself_tpu.models import factory

        return getattr(factory, name)
    if name == "tokenize":
        from clipself_tpu.tokenizer import tokenize

        return tokenize
    if name == "list_pretrained":
        from clipself_tpu.models.pretrained import list_pretrained

        return list_pretrained
    raise AttributeError(f"module 'clipself_tpu' has no attribute {name!r}")
