from clipself_tpu.core.config import (  # noqa: F401
    CLIPConfig,
    TextConfig,
    VisionConfig,
    get_model_config,
    list_models,
)
from clipself_tpu.core.constants import (  # noqa: F401
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)
