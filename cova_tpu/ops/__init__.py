from cova_tpu.ops.iou import iou_matrix, iou_pairwise  # noqa: F401
from cova_tpu.ops.assignment import solve_assignment  # noqa: F401
from cova_tpu.ops.cc import connected_components, mask_to_boxes  # noqa: F401
from cova_tpu.ops.preprocess import (  # noqa: F401
    clip6_normalize,
    temporal_stack,
    metapreprocess,
)
from cova_tpu.ops.nms import batched_nms  # noqa: F401
