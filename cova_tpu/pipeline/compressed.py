"""The compressed-domain stage as one jitted device program.

The reference runs this stage as a GStreamer graph of threads:
metapreprocess -> nvinfer(BlobNet, batch 512) -> maskcopy -> bboxcc ->
cova's SORT update (reference: pipeline/cova/pipeline.py:33-405, call
stack SURVEY.md §3.2). On TPU the whole chain is a single program over a
chunk of F frames per stream:

  metadata (R, F+T-1, H, W, C) u8
    -> temporal stack + clip normalize          (gather, fused)
    -> BlobNet                                   (batched (R*F) on the MXU)
    -> threshold -> connected components -> boxes (vmapped label prop)
    -> SORT                                      (lax.scan over F, vmapped over R)

R is the number of independent GoP ranges ("virtual streams") — the
batch-parallel equivalent of the reference's 32-way gopsplit fan-out
(§2.3); on multiple chips R is sharded over the mesh (see
cova_tpu.parallel).

Outputs are the fixed-shape per-frame SortOutputs stacked over (R, F),
pulled to host once per chunk for the scheduler/aggregator.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from cova_tpu.config import CovaConfig
from cova_tpu.models.blobnet import BlobNet
from cova_tpu.ops.cc import mask_to_boxes
from cova_tpu.ops.preprocess import metapreprocess
from cova_tpu.tracker.sort import SortState, sort_init, sort_step
from cova_tpu.types import MAX_BOXES_PER_FRAME


@functools.partial(
    jax.jit,
    static_argnames=("model", "cfg", "max_boxes"),
)
def compressed_stage_step(
    model: BlobNet,
    variables: Any,
    cfg: CovaConfig,
    metadata: jnp.ndarray,  # (R, F + T - 1, H, W, C) u8
    sort_state: SortState,  # vmapped over R
    ts0: jnp.ndarray,  # (R,) int32 — frame index of window 0 per range
    max_boxes: int = MAX_BOXES_PER_FRAME,
):
    """Run one chunk. Returns (new_sort_state, outputs, masks, boxes)."""
    r, ft, h, w, c = metadata.shape
    t = cfg.video.timestep
    f = ft - t + 1

    # metapreprocess over each range, then fold (R, F) into one batch.
    x = jax.vmap(lambda m: metapreprocess(m, t, cfg.compressed.gamma))(metadata)
    x = x.reshape(r * f, t, h, w, c)

    probs = model.apply(variables, x, train=False)  # (R*F, H, W)
    masks = probs > cfg.compressed.mask_threshold
    boxes = mask_to_boxes(
        masks, cfg.compressed.cc_threshold, max_boxes
    )  # leading dim R*F
    boxes = jax.tree_util.tree_map(
        lambda a: a.reshape((r, f) + a.shape[1:]), boxes
    )

    def per_range(state, range_boxes, start_ts):
        def step(st, inp):
            frame_boxes, i = inp
            return sort_step(st, frame_boxes, start_ts + i, cfg.sort)

        return jax.lax.scan(
            step, state, (range_boxes, jnp.arange(f, dtype=jnp.int32))
        )

    new_state, outputs = jax.vmap(per_range)(sort_state, boxes, ts0)
    return new_state, pack_outputs(outputs), masks.reshape(r, f, h, w), boxes


def pack_outputs(o):
    """Compact the per-frame SortOutputs for the host pull. The tunnel
    between host and chip can be very slow (~1 MB/s device->host on the
    axon dev setup), so every byte in this pytree costs wall-clock:
    boxes go to f16, counters to u8/i32, and the six booleans into one
    bitmask byte."""
    flags = (
        o.exists.astype(jnp.uint8)
        | (o.active.astype(jnp.uint8) << 1)
        | (o.predicted.astype(jnp.uint8) << 2)
        | (o.death.astype(jnp.uint8) << 3)
        | (o.death_active.astype(jnp.uint8) << 4)
    )
    return {
        "ltwh": o.track_ltwh.astype(jnp.float16),
        "track_id": o.track_id,  # i32
        "track_id_post": o.track_id_post,  # i32
        "flags": flags,  # u8
        "death_id": o.death_id,  # i32
        "death_start": o.death_start,  # i32
        "death_last_match": o.death_last_match,  # i32
        "death_tsu": jnp.clip(o.death_tsu, 0, 255).astype(jnp.uint8),
    }


def unpack_outputs_np(packed):
    """Host-side view over pulled packed outputs (numpy), exposing the
    SortOutputs field names HostTracker consumes."""
    import types as _types

    import numpy as _np

    flags = _np.asarray(packed["flags"])
    ns = _types.SimpleNamespace(
        track_ltwh=_np.asarray(packed["ltwh"]).astype(_np.float32),
        track_id=_np.asarray(packed["track_id"]),
        track_id_post=_np.asarray(packed["track_id_post"]),
        exists=(flags & 1) != 0,
        active=(flags & 2) != 0,
        predicted=(flags & 4) != 0,
        death=(flags & 8) != 0,
        death_active=(flags & 16) != 0,
        death_id=_np.asarray(packed["death_id"]),
        death_start=_np.asarray(packed["death_start"]),
        death_last_match=_np.asarray(packed["death_last_match"]),
        death_tsu=_np.asarray(packed["death_tsu"]).astype(_np.int32),
    )
    return ns


class CompressedStage:
    """Host wrapper holding model variables and per-range SORT state."""

    def __init__(self, model: BlobNet, variables, cfg: CovaConfig, num_ranges: int):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.num_ranges = num_ranges
        mt = cfg.sort.max_tracks
        # NB: jitted — eager ops on the experimental axon TPU backend
        # degrade the runtime to ~3.3 s per subsequent program execution.
        self.sort_state = jax.jit(
            lambda: jax.vmap(lambda _: sort_init(mt))(jnp.arange(num_ranges))
        )()

    def run_chunk(self, metadata, ts0):
        """metadata: (R, F+T-1, H, W, C) u8; ts0: (R,) int32."""
        self.sort_state, outputs, masks, boxes = compressed_stage_step(
            self.model,
            self.variables,
            self.cfg,
            jnp.asarray(metadata),
            self.sort_state,
            jnp.asarray(ts0, jnp.int32),
        )
        return outputs, masks, boxes
