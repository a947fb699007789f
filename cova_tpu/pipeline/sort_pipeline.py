"""Standalone tracking pipeline.

Port of the reference sorttracker element path (reference:
cova-rs/gst-plugins/src/sorttracker/imp.rs + pipeline/sort/pipeline.py):
runs the compressed-domain stage and emits dead-track histories to a
CSV, without the frame-selection / oracle stages — useful for tracker
evaluation and debugging.
"""

from __future__ import annotations

import dataclasses
import pathlib
import time
from typing import Optional

import jax
import numpy as np

from cova_tpu.aggregator.associator import BoxRec, _Writer
from cova_tpu.codec import Mp4Demuxer
from cova_tpu.config import CovaConfig
from cova_tpu.models.blobnet import create_blobnet
from cova_tpu.pipeline.compressed import CompressedStage
from cova_tpu.scheduler import HostTracker
from cova_tpu.utils.dataset import pack_metadata


@dataclasses.dataclass
class SortResult:
    num_frames: int
    dead_tracks: int
    elapsed_seconds: float


class SortPipeline:
    def __init__(
        self,
        input_path: str,
        output_path: str,
        cfg: CovaConfig = CovaConfig(),
        variables=None,
        log=print,
    ):
        self.demux = Mp4Demuxer(input_path)
        self.cfg = cfg
        self.log = log
        model, default_vars = create_blobnet(jax.random.PRNGKey(0))
        self.model = model
        self.variables = variables if variables is not None else default_vars
        self.stage = CompressedStage(model, self.variables, cfg, 1)
        pathlib.Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        self.writer = _Writer(output_path)

    def run(self, max_frames: Optional[int] = None) -> SortResult:
        cfg = self.cfg
        t = cfg.video.timestep
        f = cfg.compressed.batch_frames
        fps = cfg.video.fps
        demux = self.demux
        n = demux.num_samples if max_frames is None else min(
            demux.num_samples, max_frames
        )

        dead = [0]

        def on_dead(rec):
            dead[0] += 1
            for ts, (l, tp, w, h) in rec.history:
                self.writer.row(
                    BoxRec(
                        left=l * 16,
                        top=tp * 16,
                        width=w * 16,
                        height=h * 16,
                        area=w * h * 256,
                        track_id=rec.track_id,
                        timestamp=ts / fps,
                        class_id=None,
                        confidence=None,
                    )
                )

        ht = HostTracker(on_dead=on_dead)
        order = demux.display_order(0, n)

        start = time.perf_counter()
        total = 0
        for off in range(0, n - t + 1, f):
            count = min(f + t - 1, n - off)
            if count < t:
                break
            meta = demux.entropy_decode_indices(order[off : off + count])
            frames = pack_metadata(meta)
            chunk = np.zeros((1, f + t - 1, *frames.shape[1:]), np.uint8)
            chunk[0, :count] = frames
            outputs, _, _ = self.stage.run_chunk(chunk, np.array([off], np.int32))
            from cova_tpu.pipeline.compressed import unpack_outputs_np
            import types as _types

            out_np = unpack_outputs_np(outputs, self.stage.packed_shape)
            frames_here = min(f, n - t + 1 - off)
            for k in range(frames_here):
                row = _types.SimpleNamespace(
                    **{
                        name: getattr(out_np, name)[0, k]
                        for name in (
                            "track_ltwh", "track_id", "track_id_post",
                            "exists", "active", "predicted", "death",
                            "death_id", "death_start", "death_last_match",
                            "death_tsu", "death_active",
                        )
                    }
                )
                ht.update(float(off + k), row)
                total += 1
        ht.finalize(cfg.sort.min_hits)
        self.writer.close()
        return SortResult(total, dead[0], time.perf_counter() - start)
