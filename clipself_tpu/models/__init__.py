from clipself_tpu.models.clip import CLIP  # noqa: F401
from clipself_tpu.models.eva_vit import EvaViT  # noqa: F401
from clipself_tpu.models.text_transformer import TextTransformer  # noqa: F401
from clipself_tpu.models.factory import create_model  # noqa: F401
