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
   "vs_baseline": N / (30 * 10), ...}

vs_baseline normalizes against the BASELINE.json north star of 10x
real-time (30 fps video) compressed-domain throughput per chip.

The headline `value` is the median PROCESS-CPU-TIME rate: this host is
a 1-core KVM guest with heavy, weather-dependent steal — wall rates
drift +/-11% between passes (BENCH_r03 passes 1208-1506), so a wall
headline can dip below target on a bad-steal day without any real
regression (VERDICT r3 weak #3). CPU time is the steal-independent
signal; the wall median and every per-pass rate are carried alongside
(`wall_fps`, `passes_fps`, `passes_cpu_fps`) so both views stay
recorded. `value_basis` marks the semantics change vs BENCH_r01-r03
(whose `value` was the wall median).

CPU time is steal-independent but NOT frequency-independent: the
guest's effective per-cpu-second throughput itself drifts 10-30%
between windows (measured 2026-08-19 by interleaving binary-identical
decoders: 2136 -> 1909 standalone cpu-fps within minutes; the full
pipeline measured 1246-1628 cpu-fps across one hour at two commits
whose compiled code A/B-ties). `cpu_calib_mips` records a fixed-work
scalar probe (million iterations per cpu-second, measured before and
after the passes) so any capture can be read against the machine's
effective speed at that moment — compare value/cpu_calib across
captures, not raw values.

`device_fps` records the chip's own ceiling — pre-decoded wire16
chunks held in RAM -> masks step -> pull, no entropy decode in the
loop — so the "decode on more host cores is the scaling lever" claim
is a measurement, not an assumption (VERDICT r3 next #3): one chip
sustains device_fps of BlobNet masks; each ~1850-fps host decode core
fills device_fps/1850 of that.

COVA_BENCH_INPUT selects the input: an MP4 path, or the literal token
`1080p` to build (cached) and bench the 1080p evaluation stream — the
demo clip upscaled to 1920x1080 and re-encoded at x264 defaults
(examples/make_dataset2.py build_1080p) — the resolution the
BASELINE.md north star is stated at.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEMO = os.environ.get("COVA_BENCH_INPUT", "/root/reference/demo/1m.mp4")
if DEMO == "1080p":
    from examples.make_dataset2 import build_1080p

    DEMO = build_1080p()
WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts", "blobnet_demo.npz"
)

# Pinned reference effective-CPU-speed: the mean cpu_calib_mips of the
# committed BENCH_r04.json capture ([8.48, 7.97]). value_calib_normalized
# re-expresses any capture's headline at this speed so captures taken in
# different guest-weather windows are directly comparable.
CALIB_REF_MIPS = 8.22


def main():
    import dataclasses
    import threading as _threading

    # Device init/warmup watchdog, armed before jax import: a fresh
    # process can legitimately stall minutes on the first compile/pull,
    # but a DEAD device tunnel blocks backend init forever — give the
    # driver a diagnosable failure instead of an indefinite hang (no
    # JSON is emitted: a fake number would read as a regression).
    warmup_deadline = float(os.environ.get("COVA_BENCH_WARMUP_TIMEOUT", 1500))
    warmed = _threading.Event()

    def _watchdog():
        if not warmed.wait(warmup_deadline):
            print(
                f"bench: device init/warmup did not complete within "
                f"{warmup_deadline:.0f}s — device link down? "
                f"(COVA_BENCH_WARMUP_TIMEOUT to adjust)",
                file=sys.stderr,
                flush=True,
            )
            os._exit(3)

    _threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import numpy as np

    from cova_tpu.codec import Mp4Demuxer
    from cova_tpu.config import CovaConfig
    from cova_tpu.models.blobnet import create_blobnet, load_artifact
    from cova_tpu.pipeline.compressed import CompressedStage, unpack_masks
    from cova_tpu.tracker.host import HostSort, cc_boxes

    cfg = CovaConfig()
    cfg = dataclasses.replace(
        cfg,
        # The committed demo configuration (ACCURACY.md): cc_threshold 3
        # is the dataset's tuned CC area knob — the bench measures the
        # production config, not an untuned default.
        compressed=dataclasses.replace(cfg.compressed, cc_threshold=3),
    )
    demux = Mp4Demuxer(DEMO)
    n = demux.num_samples
    t = cfg.video.timestep
    threads = min(os.cpu_count() or 8, 16)

    if os.path.exists(WEIGHTS):
        # Trained weights give realistic mask/box/track densities; the
        # artifact's stored contract picks the metadata channels.
        model, variables, wmeta = load_artifact(WEIGHTS)
        cfg = dataclasses.replace(
            cfg,
            compressed=dataclasses.replace(
                cfg.compressed,
                use_nnz_channel=bool(wmeta.get("use_nnz_channel", False)),
                signed_mv=bool(wmeta.get("signed_mv", False)),
            ),
        )
    else:
        model, variables = create_blobnet(jax.random.PRNGKey(0))

    r = cfg.parallel.num_ranges
    f = cfg.compressed.batch_frames
    # GoP-aligned ranges (like CovaPipeline._range_bounds): entropy
    # decode is sequential within a GoP (DPB for exact B MVs), so a
    # range straddling GoPs would re-decode the straddled prefix.
    import math

    gops = demux.gops()

    def make_ranges(nr):
        per_gop = max(1, math.ceil(len(gops) / nr))
        b = []
        for i in range(0, len(gops), per_gop):
            chunk_g = gops[i : i + per_gop]
            b.append(
                (chunk_g[0].first_sample, sum(g.num_samples for g in chunk_g))
            )
        while len(b) < nr:
            b.append((n, 0))
        b = b[:nr]
        # Windows per range; chunks follow the longest range and shorter
        # ranges stop contributing (zero-filled tail slots), exactly like
        # CovaPipeline.run's accounting.
        wm = [max(0, c - t + 1) for _, c in b]
        # Display-order sample indices per range — the bench decodes
        # EXACTLY what the pipeline decodes (B-frame presentation
        # reordering incl. the display_order index work), not coded
        # order (VERDICT r2 weak #7).
        dd = [
            demux.display_order(s0, cnt) if cnt else np.zeros(0, np.int32)
            for s0, cnt in b
        ]
        return b, wm, dd

    bounds, wmax, disp = make_ranges(r)
    longest = max(wmax)
    mh, mw = demux.mb_height, demux.mb_width
    stage = CompressedStage(model, variables, cfg, r)

    with_nnz = cfg.compressed.use_nnz_channel
    signed = cfg.compressed.signed_mv

    def fresh_chunk(nr=None):
        # 2-byte/cell wire format (entropy_decode_packed16): halves the
        # host->device upload, which dominates the device roundtrip on
        # the tunneled link; unpacked on device bit-exactly.
        c = np.zeros((nr or r, f + t - 1, mh, mw, 2), np.uint8)
        if signed:
            c[..., 1] = 0x88  # zero motion (mv_x=mv_y=8 -> offset 128)
        return c

    # Warmup/compile, synchronized by an actual pull; disarms the
    # init/warmup watchdog above.
    np.asarray(stage.run_chunk_masks(fresh_chunk()))
    warmed.set()

    debug = os.environ.get("COVA_BENCH_DEBUG")

    import threading

    def one_pass():
        start = time.perf_counter()
        cpu0 = time.process_time()
        processed = 0
        stages = {"decode": 0.0, "dispatch": 0.0, "pull": 0.0, "cc": 0.0,
                  "sort": 0.0, "elapsed": 0.0, "cpu": 0.0}
        trackers = [HostSort(cfg.sort) for _ in range(r)]
        pending = None  # (pull_thread, result_box, win0)

        def consume(th, box, win0):
            t0 = time.perf_counter()
            th.join()
            masks = unpack_masks(box[0], stage.masks_shape)
            stages["pull"] += time.perf_counter() - t0
            flat = masks.reshape(r * f, mh, mw)
            t0 = time.perf_counter()
            ltwh, _, valid = cc_boxes(flat, cfg.compressed.cc_threshold, 16)
            stages["cc"] += time.perf_counter() - t0
            ltwh = ltwh.reshape(r, f, 16, 4)
            valid = valid.reshape(r, f, 16)
            t0 = time.perf_counter()
            for ri in range(r):
                nf = min(f, wmax[ri] - win0)
                if nf > 0:
                    # One ABI crossing per (range, chunk) instead of per
                    # frame; equivalence with per-frame update() pinned
                    # by tests/test_cctrack.py.
                    trackers[ri].update_batch(
                        ltwh[ri, :nf], valid[ri, :nf], float(win0)
                    )
            stages["sort"] += time.perf_counter() - t0

        # Two reusable chunk buffers, alternating: buffer i%2 is only
        # rewritten at chunk i+2, after chunk i's OUTPUTS were pulled —
        # so its (async) host->device transfer has long completed.
        # Zero only regions a previous use wrote beyond the new extent
        # (equivalent to a fresh np.zeros without re-zeroing 44 MB).
        bufs = [fresh_chunk() for _ in (0, 1)]
        prev_n = [[0] * r, [0] * r]
        for ci, off in enumerate(range(0, longest, f)):
            chunk, pn = bufs[ci & 1], prev_n[ci & 1]
            t0 = time.perf_counter()
            for ri, (s0, cnt) in enumerate(bounds):
                count = min(f + t - 1, cnt - off)
                if count <= 0 or off >= wmax[ri]:
                    count = 0
                else:
                    demux.entropy_decode_packed16(
                        disp[ri][off : off + count],
                        with_nnz=with_nnz,
                        signed_mv=signed,
                        threads=threads,
                        out=chunk[ri, :count],
                    )
                if count < pn[ri]:
                    chunk[ri, count : pn[ri]] = 0
                    if signed:
                        chunk[ri, count : pn[ri], :, :, 1] = 0x88
                pn[ri] = count
            stages["decode"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            cur = stage.run_chunk_masks(chunk)
            # Pull on a worker thread: copy_to_host_async is a no-op on
            # the axon backend (measured — a later np.asarray pays the
            # full transfer either way), but np.asarray releases the
            # GIL while waiting, so a thread genuinely rides the
            # transfer along the next chunk's entropy decode.
            box = []
            th = threading.Thread(
                target=lambda a=cur: box.append(np.asarray(a))
            )
            th.start()
            stages["dispatch"] += time.perf_counter() - t0
            if pending is not None:
                consume(*pending)
            pending = (th, box, off)
            processed += sum(max(0, min(f, wm - off)) for wm in wmax)
        if pending is not None:
            consume(*pending)
        for tr in trackers:
            tr.finalize()
        elapsed = time.perf_counter() - start
        stages["elapsed"] = elapsed
        # Process CPU time excludes VM steal / involuntary preemption:
        # on this shared host wall clock drifts 30-40% between windows,
        # so cpu ≪ elapsed marks a weather-degraded pass rather than a
        # regression (it slightly overcounts by including the pull
        # thread's CPU, so it is diagnostic, not the headline).
        stages["cpu"] = time.process_time() - cpu0
        if debug:
            parts = " ".join(f"{k}={v:.2f}" for k, v in stages.items())
            print(f"# pass: {elapsed:.2f}s {parts}", file=sys.stderr)
        return processed, elapsed, stages

    # Median of 5 passes: the shared dev host's wall clock is noisy
    # (background load, device-link weather), a single pass is not a
    # reliable throughput estimate. The emitted JSON carries every
    # pass's wall rate AND cpu-time rate plus the median pass's stage
    # split, so a noisy-host run is distinguishable from a real
    # regression (VERDICT r2 next #2). The headline is the cpu-time
    # median (see module docstring; VERDICT r3 next #7).
    def cpu_probe():
        # Fixed-work scalar calibration (module docstring): 2M LCG
        # iterations of pure-Python integer work, timed in process-CPU
        # seconds. Branchy scalar integer code, like the decoder — NOT
        # numpy (which would measure SIMD/bandwidth instead). Returns
        # million iterations per cpu-second.
        t0 = time.process_time()
        x = 0
        for i in range(2_000_000):
            x = (x * 1103515245 + i) & 0xFFFFFFFF
        return 2.0 / (time.process_time() - t0)

    calib = [cpu_probe()]
    rates = []
    cpu_rates = []
    stage_splits = []
    for _ in range(5):
        processed, elapsed, stages = one_pass()
        rates.append(processed / elapsed)
        cpu_rates.append(processed / stages["cpu"])
        stage_splits.append(stages)
    order = sorted(range(len(rates)), key=lambda i: rates[i])
    wall_fps = rates[order[len(order) // 2]]
    # Headline pass = the cpu-rate median pass; the recorded stage split
    # comes from the SAME pass so one JSON record describes one pass
    # (ADVICE r4: the r4 record mixed the wall-median pass's split with
    # the cpu-median headline).
    cpu_order = sorted(range(len(cpu_rates)), key=lambda i: cpu_rates[i])
    mid = cpu_order[len(cpu_order) // 2]
    fps = cpu_rates[mid]
    med = stage_splits[mid]
    calib.append(cpu_probe())
    calib_mean = sum(calib) / len(calib)

    # Device-only ceiling (VERDICT r3 next #3): every chunk pre-decoded
    # and held in RAM; the loop is masks step -> pull, two-deep
    # pipelined like the main loop. No entropy decode on the critical
    # path, so this is what one chip's BlobNet path sustains — the
    # measured basis for "more host decode cores scale until device_fps".
    reps = max(1, int(os.environ.get("COVA_BENCH_DEVICE_REPS", "4")))

    def measure_device_fps(nr, st=None):
        """Median device-only fps at R=nr ranges (3 passes). st reuses
        an already-compiled stage; otherwise one is built for nr."""
        b_, wm_, dd_ = make_ranges(nr)
        longest_ = max(wm_)
        if st is None:
            st = CompressedStage(model, variables, cfg, nr)
        chunks = []
        for off in range(0, longest_, f):
            chunk = fresh_chunk(nr)
            nframes = 0
            for ri, (s0, cnt) in enumerate(b_):
                count = min(f + t - 1, cnt - off)
                if count <= 0 or off >= wm_[ri]:
                    count = 0
                else:
                    demux.entropy_decode_packed16(
                        dd_[ri][off : off + count],
                        with_nnz=with_nnz,
                        signed_mv=signed,
                        threads=threads,
                        out=chunk[ri, :count],
                    )
                nframes += max(0, min(f, wm_[ri] - off))
            chunks.append((chunk, nframes))
        # Compile + first-pull warmup outside the timed passes.
        np.asarray(st.run_chunk_masks(chunks[0][0]))

        def device_pass():
            start = time.perf_counter()
            frames = 0
            pending = None
            for _ in range(reps):
                for chunk, nframes in chunks:
                    cur = st.run_chunk_masks(chunk)
                    box = []
                    th = threading.Thread(
                        target=lambda a=cur: box.append(np.asarray(a))
                    )
                    th.start()
                    if pending is not None:
                        pending.join()
                    pending = th
                    frames += nframes
            if pending is not None:
                pending.join()
            return frames / (time.perf_counter() - start)

        rates = sorted(device_pass() for _ in range(3))
        return rates[1], rates

    device_fps, device_rates = measure_device_fps(r, stage)

    # Optional R-sweep of the device ceiling (VERDICT r4 weak #4: the
    # "~5 host decode cores saturate one chip" extrapolation was a
    # single-point measurement): COVA_BENCH_SWEEP="2,4,8,16" measures
    # device_fps at each batch width, showing where BlobNet batching
    # saturates the chip (each R compiles its own program).
    sweep = {}
    if os.environ.get("COVA_BENCH_SWEEP"):
        for nr in [int(x) for x in os.environ["COVA_BENCH_SWEEP"].split(",")]:
            sweep[str(nr)], _ = measure_device_fps(nr)
            print(f"# sweep R={nr}: {sweep[str(nr)]:.1f} fps",
                  file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": "compressed_domain_fps",
                "value": round(fps, 1),
                "unit": "frames/sec",
                # Headline semantics (r4+): median process-CPU-time rate
                # — steal-independent on this noisy shared host; wall
                # median kept alongside (module docstring).
                "value_basis": "cpu_time_median",
                "wall_fps": round(wall_fps, 1),
                # Self-evidence: which backend actually ran the device
                # step (JAX_PLATFORMS=axon raises rather than silently
                # falling back, but the field makes any future fallback
                # visible in the recorded artifact).
                "platform": jax.devices()[0].platform,
                "vs_baseline": round(fps / (30 * 10), 3),
                "passes_fps": [round(x, 1) for x in rates],
                "passes_cpu_fps": [round(x, 1) for x in cpu_rates],
                # Effective guest CPU speed at capture time (fixed-work
                # scalar probe, M iters/cpu-sec, [before, after] the
                # passes) — cpu-time rates are steal-independent but not
                # frequency-independent; normalize by this across
                # captures (module docstring).
                "cpu_calib_mips": [round(x, 2) for x in calib],
                # The calibration APPLIED (VERDICT r4 next #7): headline
                # re-expressed at the pinned reference CPU speed
                # (CALIB_REF_MIPS = the BENCH_r04 committed capture's
                # mean calib), i.e. fps * CALIB_REF / calib_now. This is
                # the regression-trackable number — two captures hours
                # apart should agree on it within ~5% while raw cpu-fps
                # drifts 10-30% with guest weather.
                "value_calib_normalized": round(
                    fps * CALIB_REF_MIPS / calib_mean, 1
                ),
                "calib_ref_mips": CALIB_REF_MIPS,
                # Stage split of the SAME pass the headline comes from
                # (the cpu-rate median pass).
                "stage_seconds": {k: round(v, 3) for k, v in med.items()},
                "frames_per_pass": processed,
                "device_fps": round(device_fps, 1),
                "device_fps_passes": [round(x, 1) for x in device_rates],
                **(
                    {"device_fps_sweep_by_R": {
                        k: round(v, 1) for k, v in sweep.items()
                    }}
                    if sweep
                    else {}
                ),
                "input": {
                    "path": DEMO,
                    "width": demux.width,
                    "height": demux.height,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
