#!/usr/bin/env python3
"""Long-stream soak: bounded-memory validation of the full pipeline.

The reference runs days of video per config (multi-day datasets in
/root/reference/parse/config.yaml); the offline equivalent is the demo
clip looped N times through the full CovaPipeline (entropy decode ->
BlobNet -> CC/SORT -> selector -> selective pixel decode -> aggregator)
while watching RSS. Validates (VERDICT r2 next #7):

  * GoP decoder-state cache eviction (csrc/api.cc kGopCacheCap),
  * aggregator growth (associator.py self.dnns / self.tracks between
    finalizations),
  * selector flush over hours of pts,
  * per-GoP recent-meta caches and the DPB pool.

Usage: python examples/soak.py [REPS=10] [OUT_DIR=/tmp/cova_soak]

Prints one JSON line: frames, fps, RSS at 1/4 point vs end, dead
tracks, selector counters. Exits nonzero if RSS grows more than
SOAK_RSS_BUDGET_MB (default 512) beyond the quarter-point baseline —
steady state must be flat.
"""

import json
import os
import pathlib
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = pathlib.Path(__file__).resolve().parent.parent


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def current_rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e6


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cova_soak"
    budget_mb = float(os.environ.get("SOAK_RSS_BUDGET_MB", "512"))

    import jax  # noqa: F401  (initialize before timing)

    import dataclasses

    from cova_tpu.config import CovaConfig, ParallelConfig
    from cova_tpu.models.bgdet import StaticBackgroundDetector, load_background
    from cova_tpu.models.blobnet import load_artifact
    from cova_tpu.pipeline.cova import CovaPipeline
    from cova_tpu.utils.mp4loop import write_looped_mp4

    looped = os.path.join(out_dir, f"loop{reps}.mp4")
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    n = write_looped_mp4("/root/reference/demo/1m.mp4", looped, reps)
    print(f"# looped stream: {n} samples ({n / 30 / 60:.1f} min)", file=sys.stderr)

    # The artifact's stored input contract (nnz channel, signed MVs)
    # configures the stage — like bench.py and reproduce_accuracy.py.
    _, variables, wmeta = load_artifact(REPO / "artifacts" / "blobnet_demo.npz")
    detector = StaticBackgroundDetector(
        load_background(REPO / "artifacts" / "demo_bg.npy")
    )
    # 8 ranges like production; the looped stream has 8*reps GoPs so
    # every range spans many GoPs (exercises per-GoP state turnover).
    cfg = CovaConfig(parallel=ParallelConfig(num_ranges=8))
    cfg = dataclasses.replace(
        cfg,
        compressed=dataclasses.replace(
            cfg.compressed,
            use_nnz_channel=bool(wmeta.get("use_nnz_channel", False)),
            signed_mv=bool(wmeta.get("signed_mv", False)),
        ),
    )
    pipe = CovaPipeline(
        looped, os.path.join(out_dir, "csv"), cfg,
        variables=variables, detector=detector, log=lambda *a: None,
    )

    # Sample current RSS mid-run from a watcher thread; the quarter-point
    # reading is the steady-state baseline (model + buffers resident).
    samples = []
    stop = threading.Event()

    def watcher():
        while not stop.is_set():
            samples.append((time.monotonic(), current_rss_mb()))
            stop.wait(2.0)

    th = threading.Thread(target=watcher, daemon=True)
    t0 = time.monotonic()
    th.start()
    res = pipe.run()
    stop.set()
    th.join()
    elapsed = time.monotonic() - t0

    q = max(1, len(samples) // 4)
    rss_quarter = samples[q - 1][1] if samples else current_rss_mb()
    rss_end = samples[-1][1] if samples else current_rss_mb()
    growth = rss_end - rss_quarter

    report = {
        "frames": res.num_frames,
        "elapsed_seconds": round(elapsed, 1),
        "fps": round(res.num_frames / elapsed, 1),
        "dead_tracks": res.dead_tracks,
        "dropped": res.dropped,
        "decoded_dependency": res.decoded_dependency,
        "decoded_inference": res.decoded_inference,
        "rss_quarter_mb": round(rss_quarter, 1),
        "rss_end_mb": round(rss_end, 1),
        "rss_growth_mb": round(growth, 1),
        "rss_peak_mb": round(rss_mb(), 1),
    }
    print(json.dumps(report))
    if growth > budget_mb:
        print(
            f"FAIL: steady-state RSS grew {growth:.0f} MB "
            f"(budget {budget_mb:.0f})",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
