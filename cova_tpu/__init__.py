"""cova_tpu — a TPU-native compressed-domain video-analytics framework.

A from-scratch rebuild of the capabilities of CoVA ("Exploiting
Compressed-Domain Analysis to Accelerate Video Analytics", USENIX ATC'22,
reference implementation casys-kaist/CoVA) designed for TPU hardware:

* the compressed-domain stage (macroblock metadata -> BlobNet mask ->
  connected components -> SORT tracking) runs as one jitted, batched JAX
  program — frames are batch dimensions, tracker state is a ``lax.scan``
  carry, streams/GoP-ranges are a vmapped/sharded axis;
* the codec host layer (MP4 demux, H.264 entropy decode, selective pixel
  decode) is first-party C++ bound via ctypes;
* the pixel-domain oracle (YOLOv4) is a Flax model batched over the few
  frames that survive compressed-domain filtering;
* aggregation/association and query metrics are in-process modules instead
  of the reference's TCP-connected processes.

Layer map (mirrors reference SURVEY.md §1, re-architected):

  L6 query       cova_tpu.query           (reference: parse/)
  L5 aggregate   cova_tpu.aggregator      (reference: cova-rs/analysis-aggregator)
  L4 orchestrate cova_tpu.pipeline        (reference: pipeline/, experiment/)
  L3 dataflow    cova_tpu.ops, .tracker, .scheduler
                                          (reference: gst plugins)
  L2 algorithms  cova_tpu.ops.{cc,assignment,iou}, .tracker.kalman
                                          (reference: cova-rs/{sort,bbox})
  L1 models      cova_tpu.models          (reference: utils/model, nvinfer)
  L0 codec       cova_tpu.codec + csrc/   (reference: patched FFmpeg fork)
"""

__version__ = "0.1.0"

from cova_tpu import config as config  # noqa: F401
from cova_tpu import types as types  # noqa: F401


# Optional persistent XLA compilation cache (opt-in via
# COVA_COMPILE_CACHE=<dir>). Left off by default: on the experimental
# axon TPU backend, cache-restored executables were observed running
# ~1000x slower per call (a constant ~3.3 s/execute penalty), so caching
# only pays when that backend bug is fixed or on other platforms.
import os as _os

_cache_dir = _os.environ.get("COVA_COMPILE_CACHE")
if _cache_dir:
    import jax as _jax

    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # older jax without the knobs
        pass
