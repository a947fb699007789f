from cova_tpu.tracker.kalman import (  # noqa: F401
    kalman_init,
    kalman_predict,
    kalman_update,
    bbox_to_z,
    x_to_bbox,
)
from cova_tpu.tracker.sort import SortState, SortOutputs, sort_init, sort_step  # noqa: F401
