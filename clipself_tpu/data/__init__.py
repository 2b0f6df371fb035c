from clipself_tpu.data.datasets import (  # noqa: F401
    COCOPanopticEvalDataset,
    GridDistillDataset,
    ProposalDistillDataset,
    RegionCLIPDataset,
)
from clipself_tpu.data.loader import make_loader  # noqa: F401
