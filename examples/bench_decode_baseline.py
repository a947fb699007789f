#!/usr/bin/env python3
"""The compressed-domain premise, quantified: entropy-only decode vs
libavcodec FULL decode on the same single core and the same clip.

CoVA's whole design rests on the ratio between these two numbers
(reference: the patched FFmpeg entropy-only avdec_h264 vs NVDEC full
decode — /root/reference/README.md:94-114; here both run on the host
CPU, the role split SURVEY.md §2.2 assigns). This script measures both
sides and prints one JSON line per input:

  {"input": ..., "entropy_fps": N, "full_decode_fps": N, "ratio": N, ...}

Rates are process-CPU-time based (steal-independent on this shared
1-core guest, see bench.py's docstring) with the same fixed-work
cpu_calib_mips probe recorded so captures in different guest-weather
windows stay comparable.

The full-decode side is the system libavcodec (csrc/pixdec.cc — the
exact decoder the pipeline uses for selective pixel decode), fed
coded-order AUs and drained frame by frame including the plane copies
out (delivering pixels is part of the job being priced). The
entropy-only side is the production path: entropy_decode_packed16 with
the committed artifact's wire contract (signed MV + nnz), threads=1.

Usage: python examples/bench_decode_baseline.py [--full] [INPUT.mp4 ...]
Default inputs: the 720p demo clip and the cached 1080p stream.
--full decodes the whole clip per pass (default: first 600 frames,
3 passes, median — the whole clip at 1080p full decode is ~1.5 min/pass
on this 1-core guest).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_probe():
    # Same fixed-work scalar probe as bench.py (branchy integer work).
    t0 = time.process_time()
    x = 0
    for i in range(2_000_000):
        x = (x * 1103515245 + i) & 0xFFFFFFFF
    return 2.0 / (time.process_time() - t0)


def bench_input(path, nframes=None, passes=3):
    import numpy as np

    from cova_tpu.codec import Mp4Demuxer, PixelDecoder

    demux = Mp4Demuxer(path)
    n = demux.num_samples if nframes is None else min(nframes, demux.num_samples)
    w, h = demux.width, demux.height
    calib0 = cpu_probe()

    # --- entropy-only (production wire contract, 1 thread) ---
    disp = demux.display_order(0, n)
    out = np.zeros((n, demux.mb_height, demux.mb_width, 2), np.uint8)

    def ent_pass():
        c0, t0 = time.process_time(), time.perf_counter()
        demux.entropy_decode_packed16(
            disp, with_nnz=True, signed_mv=True, threads=1, out=out
        )
        return n / (time.process_time() - c0), n / (time.perf_counter() - t0)

    ent = sorted(ent_pass() for _ in range(passes))[passes // 2]

    # --- libavcodec full decode (coded order, drain + copy out) ---
    def full_pass():
        dec = PixelDecoder(demux.extradata())
        c0, t0 = time.process_time(), time.perf_counter()
        got = 0
        for i in range(n):
            dec.send(demux.read_sample(i), pts=i)
            while dec.pop(w, h) is not None:
                got += 1
        dec.flush()
        while dec.pop(w, h) is not None:
            got += 1
        cpu, wall = time.process_time() - c0, time.perf_counter() - t0
        dec.close()
        assert got >= n - 8, f"decoder delivered {got}/{n} frames"
        return got / cpu, got / wall

    full = sorted(full_pass() for _ in range(passes))[passes // 2]
    calib1 = cpu_probe()

    rec = {
        "metric": "decode_baseline",
        "input": {"path": path, "width": w, "height": h, "frames": n},
        "value_basis": "cpu_time_median",
        "entropy_fps": round(ent[0], 1),
        "entropy_wall_fps": round(ent[1], 1),
        "full_decode_fps": round(full[0], 1),
        "full_decode_wall_fps": round(full[1], 1),
        "ratio": round(ent[0] / full[0], 2),
        "cpu_calib_mips": [round(calib0, 2), round(calib1, 2)],
        "decoder": "system libavcodec (csrc/pixdec.cc), 1 core",
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nframes = None if "--full" in sys.argv else 600
    if not args:
        from examples.make_dataset2 import build_1080p

        args = ["/root/reference/demo/1m.mp4", build_1080p()]
    for path in args:
        bench_input(path, nframes=nframes)


if __name__ == "__main__":
    main()
