#!/usr/bin/env python3
"""Headline benchmark: compressed-domain throughput per chip.

Measures the full compressed-domain path on the reference demo clip
(1280x720 H.264, 1802 frames): C++ entropy decode -> device
metapreprocess + BlobNet + threshold (the dense FLOPs, one jitted
program) -> host pull -> native connected components + SORT
(csrc/cctrack.cc) — the same work split the pipeline and the reference
use (bboxcc/OpenCV + cova-rs/sort are CPU code upstream too).

Every chunk's masks are pulled and tracked, so the number is honest
end-of-pipe throughput (on the axon backend, block_until_ready returns
before the computation finishes — only a host pull truly synchronizes).
The host decodes chunk i+1 while the device crunches chunk i.

Prints ONE JSON line:

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
WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts", "blobnet_demo.npz"
)


def main():
    import jax
    import numpy as np

    from cova_tpu.codec import Mp4Demuxer
    from cova_tpu.config import CovaConfig
    from cova_tpu.models.blobnet import create_blobnet, load_params_npz
    from cova_tpu.pipeline.compressed import CompressedStage
    from cova_tpu.tracker.host import HostSort, cc_boxes

    cfg = CovaConfig()
    demux = Mp4Demuxer(DEMO)
    n = demux.num_samples
    t = cfg.video.timestep
    threads = min(os.cpu_count() or 8, 16)

    model, variables = create_blobnet(jax.random.PRNGKey(0))
    if os.path.exists(WEIGHTS):
        # Trained weights give realistic mask/box/track densities.
        variables = load_params_npz(WEIGHTS, variables)

    r = cfg.parallel.num_ranges
    f = cfg.compressed.batch_frames
    # GoP-aligned ranges (like CovaPipeline._range_bounds): entropy
    # decode is sequential within a GoP (DPB for exact B MVs), so a
    # range straddling GoPs would re-decode the straddled prefix.
    import math

    gops = demux.gops()
    per_gop = max(1, math.ceil(len(gops) / r))
    bounds = []
    for i in range(0, len(gops), per_gop):
        chunk_g = gops[i : i + per_gop]
        bounds.append(
            (chunk_g[0].first_sample, sum(g.num_samples for g in chunk_g))
        )
    while len(bounds) < r:
        bounds.append((n, 0))
    bounds = bounds[:r]
    per_range = min(c for _, c in bounds if c) if any(c for _, c in bounds) else 0
    mh, mw = demux.mb_height, demux.mb_width
    stage = CompressedStage(model, variables, cfg, r)

    # Warmup/compile, synchronized by an actual pull.
    warm = np.zeros((r, f + t - 1, mh, mw, 3), np.uint8)
    np.asarray(stage.run_chunk_masks(warm))

    def one_pass():
        start = time.perf_counter()
        processed = 0
        trackers = [HostSort(cfg.sort) for _ in range(r)]
        pending = None  # (device_masks, frames_this_chunk, win0)

        def consume(dev_masks, nframes, win0):
            masks = np.asarray(dev_masks).reshape(stage.masks_shape)
            flat = masks.reshape(r * f, mh, mw)
            ltwh, _, valid = cc_boxes(flat, cfg.compressed.cc_threshold, 16)
            ltwh = ltwh.reshape(r, f, 16, 4)
            valid = valid.reshape(r, f, 16)
            for ri in range(r):
                for k in range(nframes):
                    trackers[ri].update(
                        ltwh[ri, k][valid[ri, k]], float(win0 + k)
                    )

        for off in range(0, per_range - t + 1, f):
            chunk = np.zeros((r, f + t - 1, mh, mw, 3), np.uint8)
            count = min(f + t - 1, per_range - off)
            for ri in range(r):
                s = bounds[ri][0] + off
                demux.entropy_decode_packed(
                    np.arange(s, s + count, dtype=np.int32),
                    threads=threads,
                    out=chunk[ri, :count],
                )
            cur = stage.run_chunk_masks(chunk)
            nf = max(0, min(f, per_range - t + 1 - off))
            if pending is not None:
                consume(*pending)
            pending = (cur, nf, off)
            processed += r * nf
        if pending is not None:
            consume(*pending)
        for tr in trackers:
            tr.finalize()
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
