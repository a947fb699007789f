"""Differential tests for the native host CC + SORT (csrc/cctrack.cc)
against the JAX device implementations (ops/cc.py, tracker/sort.py +
scheduler/tracks.py), which are themselves pinned to the reference's
cargo tests. Agreement here means the pipeline's host-tracking path and
the all-device multi-chip path compute the same thing.
"""

import numpy as np
import pytest

from cova_tpu.config import SortConfig


class TestInterlaceSupport:
    def test_mbaff_stream_decodes(self, tmp_path):
        """MBAFF interlaced H.264 decodes through the dedicated path in
        entdec_mbaff.cc (bin-exact vs libavcodec on the x264 interlaced
        matrix — see tests/test_codec.py TestMbaff; PAFF field pictures
        decode too, validated in TestPaff). This stream was the round-2
        rejection pin; it must now parse clean."""
        import subprocess

        from test_codec import build_tools

        gen, st = build_tools()
        stream = tmp_path / "ilace.lp264"
        subprocess.run(
            [str(gen), str(stream), "160", "128", "8",
             "cabac=1:interlaced=1:keyint=4", "23"],
            check=True, capture_output=True,
        )
        out = subprocess.run(
            [str(st), str(stream)], capture_output=True, text=True
        )
        assert out.returncode == 0, out.stdout
        assert "8 frames, 0 bad" in out.stdout


class TestHostCC:
    def test_against_scipy(self):
        from scipy import ndimage

        from cova_tpu.tracker.host import cc_boxes

        rng = np.random.RandomState(7)
        masks = (rng.rand(16, 45, 80) < 0.12).astype(np.uint8)
        ltwh, area, valid = cc_boxes(masks, area_threshold=2, max_boxes=128)
        s8 = np.ones((3, 3), int)
        for f in range(len(masks)):
            labs, n = ndimage.label(masks[f], structure=s8)
            boxes = []
            # scipy labels in raster order of first pixel, like OpenCV.
            for lab in range(1, n + 1):
                ys, xs = np.nonzero(labs == lab)
                if len(ys) < 2:
                    continue
                boxes.append(
                    (xs.min(), ys.min(), xs.max() - xs.min() + 1,
                     ys.max() - ys.min() + 1)
                )
            got = [tuple(ltwh[f, k]) for k in range(valid[f].sum())]
            assert len(got) == len(boxes)
            for g, b in zip(got, boxes):
                assert g == pytest.approx(b)

    def test_against_jax_cc(self):
        import jax.numpy as jnp

        from cova_tpu.ops.cc import mask_to_boxes
        from cova_tpu.tracker.host import cc_boxes

        rng = np.random.RandomState(3)
        masks = (rng.rand(8, 45, 80) < 0.25).astype(np.uint8)
        ltwh, area, valid = cc_boxes(masks, area_threshold=3, max_boxes=16)
        jb = mask_to_boxes(jnp.asarray(masks.astype(bool)), 3, 16)
        jltwh = np.asarray(jb.ltwh)
        jvalid = np.asarray(jb.valid)
        np.testing.assert_array_equal(valid, jvalid)
        np.testing.assert_allclose(
            ltwh[valid], jltwh[jvalid], rtol=0, atol=0
        )


def _run_jax_sort(cfg, det_stream):
    """Feed a detection stream through device SORT + HostTracker."""
    import jax
    import jax.numpy as jnp
    import types as _t

    from cova_tpu.scheduler.tracks import HostTracker
    from cova_tpu.tracker.sort import sort_init, sort_step
    from cova_tpu.types import Boxes

    dead = []
    ht = HostTracker(on_dead=dead.append)
    state = sort_init(cfg.max_tracks)
    mrs = []
    for ts, dets in enumerate(det_stream):
        k = cfg.max_tracks
        ltwh = np.zeros((k, 4), np.float32)
        valid = np.zeros((k,), bool)
        ltwh[: len(dets)] = dets
        valid[: len(dets)] = True
        b = Boxes(
            ltwh=jnp.asarray(ltwh),
            valid=jnp.asarray(valid),
            area=jnp.asarray(ltwh[:, 2] * ltwh[:, 3]),
            class_id=jnp.full((k,), -1, jnp.int32),
            conf=jnp.zeros((k,)),
            track_id=jnp.full((k,), -1, jnp.int32),
        )
        state, out = sort_step(state, b, jnp.int32(ts), cfg)
        out_np = _t.SimpleNamespace(
            **{
                name: np.asarray(getattr(out, name))
                for name in (
                    "track_ltwh", "track_id", "track_id_post", "exists",
                    "active", "predicted", "death", "death_id",
                    "death_start", "death_last_match", "death_tsu",
                    "death_active",
                )
            }
        )
        mrs.append(ht.update(float(ts), out_np))
    recs = ht.finalize(cfg.min_hits)
    return dead, mrs


def _run_host_sort(cfg, det_stream):
    from cova_tpu.tracker.host import HostSort

    dead = []
    hs = HostSort(cfg, on_dead=dead.append)
    mrs = []
    for ts, dets in enumerate(det_stream):
        mrs.append(hs.update(np.asarray(dets, np.float32).reshape(-1, 4), ts))
    hs.finalize()
    return dead, mrs


def _stream(seed, frames=60, grid=(45, 80), noise=False):
    """Coherent moving blobs in separated lanes. With noise=False the
    assignment optimum is unique every frame (no object overlap, no
    coasting-track-vs-newborn competition), so the exact Hungarian
    (host) and the eps-auction (device) must agree exactly; noise=True
    adds spurious dets + mid-stream disappearance, where solver
    tie-breaking may legitimately differ (the reference's Hungarian
    sides with the host here)."""
    rng = np.random.RandomState(seed)
    objs = []
    for k in range(4):
        objs.append(
            dict(
                x=rng.uniform(5, 40), y=2.0 + 11.0 * k,  # separated lanes
                vx=rng.uniform(0.2, 0.8), vy=0.0,
                w=rng.uniform(3, 8), h=rng.uniform(3, 6),
                t0=rng.randint(0, 20),
                t1=rng.randint(30, 60) if noise else frames,
            )
        )
    stream = []
    for t in range(frames):
        dets = []
        for o in objs:
            if not (o["t0"] <= t < o["t1"]):
                continue
            x = o["x"] + o["vx"] * t
            y = o["y"] + o["vy"] * t
            if 0 <= x < grid[1] - o["w"] and 0 <= y < grid[0] - o["h"]:
                dets.append([x, y, o["w"], o["h"]])
        if noise and rng.rand() < 0.2:  # spurious detection
            dets.append(
                [rng.uniform(0, 70), rng.uniform(40, 43), 2.0, 2.0]
            )
        stream.append(np.asarray(dets, np.float32).reshape(-1, 4))
    return stream


class TestHostSortDifferential:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_device_sort(self, seed):
        cfg = SortConfig(
            iou_threshold=0.1, max_age=3, min_hits=2, max_tracks=16
        )
        stream = _stream(seed)
        jd, jmr = _run_jax_sort(cfg, stream)
        hd, hmr = _run_host_sort(cfg, stream)

        assert len(jd) == len(hd)
        for a, b in zip(jd, hd):
            assert a.track_id == b.track_id
            assert a.start_ts == pytest.approx(b.start_ts)
            assert a.end_ts == pytest.approx(b.end_ts)
            assert a.seen == b.seen
            assert len(a.history) == len(b.history)
            for (ta, ba), (tb, bb) in zip(a.history, b.history):
                assert ta == pytest.approx(tb)
                assert np.allclose(ba, bb, rtol=1e-4, atol=1e-3)
        # min_required sequences agree (None vs value pattern + values).
        assert len(jmr) == len(hmr)
        for a, b in zip(jmr, hmr):
            if a is None or b is None:
                assert a is None and b is None
            else:
                assert a == pytest.approx(b)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_reduced_assignment_equals_full_matrix(self, seed):
        """The size-reduced Hungarian (identical zero-IoU rows collapsed
        to at most nd clones per weight class) must produce the same
        tracking behavior as the unreduced reference matrix
        (COVA_SORT_FULL_MATRIX=1). Run in subprocesses because the
        switch is latched per process."""
        import json
        import os
        import subprocess
        import sys
        import textwrap

        prog = textwrap.dedent(
            """
            import json, sys
            import numpy as np
            sys.path.insert(0, %r)
            from test_cctrack import _run_host_sort, _stream
            from cova_tpu.config import SortConfig
            cfg = SortConfig(iou_threshold=0.1, max_age=20, min_hits=2,
                             max_tracks=16)
            dead, mrs = _run_host_sort(cfg, _stream(%d, noise=True))
            print(json.dumps([
                [(r.track_id, r.start_ts, r.end_ts, r.seen,
                  len(r.history)) for r in dead],
                [m for m in mrs],
            ]))
            """
        ) % (os.path.dirname(os.path.abspath(__file__)), seed)

        out = {}
        for mode in ("0", "1"):
            env = dict(os.environ, COVA_SORT_FULL_MATRIX=mode)
            r = subprocess.run(
                [sys.executable, "-c", prog], capture_output=True,
                text=True, env=env, check=True,
            )
            out[mode] = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["0"] == out["1"]

    @pytest.mark.parametrize("seed", [0, 1])
    def test_update_batch_equals_per_frame(self, seed):
        """cova_sort_update_batch (one ABI crossing per chunk, the bench
        path) must report the identical dead-track stream as per-frame
        update() calls."""
        from cova_tpu.tracker.host import HostSort

        cfg = SortConfig(
            iou_threshold=0.1, max_age=3, min_hits=2, max_tracks=16
        )
        stream = _stream(seed, noise=True)
        ref, _ = _run_host_sort(cfg, stream)

        k = cfg.max_tracks
        f = len(stream)
        ltwh = np.zeros((f, k, 4), np.float32)
        valid = np.zeros((f, k), np.uint8)
        for i, dets in enumerate(stream):
            ltwh[i, : len(dets)] = dets
            valid[i, : len(dets)] = 1
        dead = []
        hs = HostSort(cfg, on_dead=dead.append)
        # Two chunks to also cross a batch boundary mid-stream.
        half = f // 2
        hs.update_batch(ltwh[:half], valid[:half], 0.0)
        hs.update_batch(ltwh[half:], valid[half:], float(half))
        hs.finalize()

        assert len(dead) == len(ref)
        for a, b in zip(dead, ref):
            assert a.track_id == b.track_id
            assert a.start_ts == pytest.approx(b.start_ts)
            assert a.end_ts == pytest.approx(b.end_ts)
            assert a.seen == b.seen
            assert len(a.history) == len(b.history)
            for (ta, ba), (tb, bb) in zip(a.history, b.history):
                assert ta == pytest.approx(tb)
                assert np.allclose(ba, bb, rtol=1e-6, atol=1e-6)

    def test_noisy_stream_close(self):
        """With spurious dets + mid-stream death, exact-Hungarian (host)
        and eps-auction (device) tie-breaking may legitimately differ;
        the behaviors must stay close (same id allocation, nearly the
        same dead set)."""
        cfg = SortConfig(
            iou_threshold=0.1, max_age=3, min_hits=2, max_tracks=16
        )
        stream = _stream(1, noise=True)
        jd, jmr = _run_jax_sort(cfg, stream)
        hd, hmr = _run_host_sort(cfg, stream)
        ja = {(r.track_id, r.start_ts, r.end_ts) for r in jd}
        ha = {(r.track_id, r.start_ts, r.end_ts) for r in hd}
        union = ja | ha
        assert len(ja ^ ha) <= max(2, len(union) // 5), (ja ^ ha)

    def test_mark_seen_suppresses_min_required(self):
        # max_age must exceed the 5-streak confirmation gate or tracks
        # die before last_match can ever advance (reference mod.rs:76-80
        # gates both tsu reset and last_match on streak >= 5).
        cfg = SortConfig(
            iou_threshold=0.1, max_age=6, min_hits=1, max_tracks=16
        )
        from cova_tpu.tracker.host import HostSort

        hs = HostSort(cfg)
        box = np.array([[10, 10, 5, 5]], np.float32)
        for t in range(10):  # streak-5 confirms at t=5..9 -> last_match 9
            hs.update(box, t)
        empty = np.zeros((0, 4), np.float32)

        def starve(hs, t0):
            for t in range(t0, t0 + 10):
                got = hs.update(empty, t)
                if got is not None:
                    return got
            return None

        # Unseen death: min_required = the track's start ts.
        mr = starve(hs, 10)
        assert mr == 0.0  # started at ts 0

        # Seen death folds to 0.0 even when started later.
        hs2 = HostSort(cfg)
        for t in range(10):
            hs2.update(box, t + 3)
        hs2.mark_seen(8.0)  # inside [3, last_match=12]
        mr2 = starve(hs2, 13)
        assert mr2 == 0.0

        # Unseen death starting later reports its start.
        hs3 = HostSort(cfg)
        for t in range(10):
            hs3.update(box, t + 3)
        mr3 = starve(hs3, 13)
        assert mr3 == 3.0
