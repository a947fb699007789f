#!/usr/bin/env python3
"""Headline benchmark: compressed-domain throughput per chip.

Measures the full compressed-domain path on the reference demo clip
(1280x720 H.264, 1802 frames): C++ entropy decode (threaded, frame
parallel) -> device metapreprocess + BlobNet + connected components +
SORT scan, overlapped host/device. Prints ONE JSON line:

  {"metric": "compressed_domain_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": N / (30 * 10)}

vs_baseline normalizes against the BASELINE.json north star of 10x
real-time (30 fps video) compressed-domain throughput per chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEMO = os.environ.get("COVA_BENCH_INPUT", "/root/reference/demo/1m.mp4")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cova_tpu.codec import Mp4Demuxer
    from cova_tpu.config import CovaConfig
    from cova_tpu.models.blobnet import create_blobnet
    from cova_tpu.pipeline.compressed import CompressedStage

    cfg = CovaConfig()
    demux = Mp4Demuxer(DEMO)
    n = demux.num_samples
    t = cfg.video.timestep
    threads = min(os.cpu_count() or 8, 16)

    model, variables = create_blobnet(
        jax.random.PRNGKey(0), dtype=jnp.bfloat16
    )

    # Chunking: R ranges x F frames per device step.
    r = cfg.parallel.num_ranges
    f = cfg.compressed.batch_frames
    per_range = n // r
    stage = CompressedStage(model, variables, cfg, r)

    # Warmup/compile with a synthetic chunk.
    warm = np.zeros((r, f + t - 1, demux.mb_height, demux.mb_width, 3), np.uint8)
    out, _, _ = stage.run_chunk(warm, np.zeros(r, np.int32))
    jax.block_until_ready(out)

    def one_pass():
        """Entropy-decode each range on the host (threaded) while the
        device crunches the previous chunk (double buffering via async
        dispatch). Returns (frames, seconds)."""
        start = time.perf_counter()
        processed = 0
        pending = None
        for off in range(0, per_range - t + 1, f):
            chunk = np.zeros(
                (r, f + t - 1, demux.mb_height, demux.mb_width, 3), np.uint8
            )
            count = min(f + t - 1, per_range - off)
            for ri in range(r):
                s = ri * per_range + off
                meta = demux.entropy_decode_range(s, count, threads=threads)
                stacked = np.stack(
                    [
                        np.minimum(meta["mb_class"], 255).astype(np.uint8),
                        np.clip(np.abs(meta["mv_x"]) // 4, 0, 255).astype(np.uint8),
                        np.clip(np.abs(meta["mv_y"]) // 4, 0, 255).astype(np.uint8),
                    ],
                    axis=-1,
                )
                chunk[:, :count][ri] = stacked
            ts0 = np.full(r, off, np.int32)
            if pending is not None:
                jax.block_until_ready(pending)
            out, _, _ = stage.run_chunk(chunk, ts0)
            pending = out
            # Count real temporal windows only (the tail chunk's F-slot
            # batch is partially zero-padding, not processed video).
            processed += r * max(0, min(f, per_range - t + 1 - off))
        if pending is not None:
            jax.block_until_ready(pending)
        return processed, time.perf_counter() - start

    # Median of 3 passes: the shared dev host's wall clock is noisy
    # (background load, device-link weather), a single pass is not a
    # reliable throughput estimate.
    rates = []
    for _ in range(3):
        processed, elapsed = one_pass()
        rates.append(processed / elapsed)
    fps = sorted(rates)[1]
    print(
        json.dumps(
            {
                "metric": "compressed_domain_fps",
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(fps / (30 * 10), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
