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
