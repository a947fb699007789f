from cova_tpu.scheduler.tracks import HostTracker  # noqa: F401
from cova_tpu.scheduler.selector import FrameSelector, SelectorCounts  # noqa: F401
