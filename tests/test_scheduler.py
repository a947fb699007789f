"""Frame selector + host tracker tests (reference semantics:
cova-rs/gst-plugins/src/cova/imp.rs:89-360)."""

import numpy as np
import pytest

from cova_tpu.config import SelectorConfig, SortConfig
from cova_tpu.scheduler import FrameSelector, HostTracker
from cova_tpu.scheduler.selector import SelectorCounts


def feed_video(sel, n_frames, gop=30, fps=30.0):
    for i in range(n_frames):
        sel.push_frame(i, i / fps, keyframe=(i % gop == 0))


class TestFrameSelector:
    def mk(self, **kw):
        emitted = []
        sel = FrameSelector(
            SelectorConfig(**kw.pop("selector", {})),
            SortConfig(max_age=5),
            fps=30.0,
            emit=lambda frames: emitted.append(frames),
            **kw,
        )
        return sel, emitted

    def test_no_deaths_drops_everything(self):
        sel, emitted = self.mk(selector={"infer_i": False})
        feed_video(sel, 600)
        for i in range(600):
            sel.on_mask_frame(i / 30.0, None)
        sel.finish()
        assert emitted == []
        assert sel.counts.dropped == 600
        assert sel.counts.decode_filter_rate() == 1.0

    def test_infer_i_samples_keyframes(self):
        sel, emitted = self.mk(selector={"infer_i": True})
        feed_video(sel, 600)
        for i in range(600):
            sel.on_mask_frame(i / 30.0, None)
        sel.finish()
        # Flushed GoPs (those older than 250 frames) emit their I frame.
        inferred = [f for fl in emitted for f in fl if not f.droppable]
        assert all(f.keyframe for f in inferred)
        assert sel.counts.decoded_inference == len(inferred)
        assert len(inferred) >= 10  # 600 frames / 30 gop - horizon

    def test_death_schedules_newest_qualifying_frame(self):
        sel, emitted = self.mk(selector={"infer_i": False})
        feed_video(sel, 300)
        # min_required=2.0 at pts 3.5 -> window [2.0, 3.0]; the reference
        # walks GoPs newest-first, so GoP [90..] qualifies (min_pts 3.0)
        # and its keyframe (frame 90) is the cheapest inference choice.
        for i in range(300):
            ts = i / 30.0
            sel.on_mask_frame(ts, 2.0 if i == 105 else None)
        sel.finish()
        scheduled = [f for fl in emitted for f in fl]
        inferred = [f for f in scheduled if not f.droppable]
        deps = [f for f in scheduled if f.droppable]
        assert len(inferred) == 1
        assert inferred[0].sample_index == 90
        assert len(deps) == 0
        assert sel.counts.decoded_inference == 1

    def test_death_mid_gop_decodes_dependencies(self):
        sel, emitted = self.mk(selector={"infer_i": False})
        feed_video(sel, 300)
        # Death at pts 2.667 -> window [2.1, 2.167]: only GoP [60..89]
        # qualifies; frames 60..62 (< 2.1s) become droppable dependencies
        # and frame 63 (2.1s) is inferred.
        for i in range(300):
            sel.on_mask_frame(i / 30.0, 2.1 if i == 80 else None)
        sel.finish()
        scheduled = [f for fl in emitted for f in fl]
        inferred = [f for f in scheduled if not f.droppable]
        deps = [f for f in scheduled if f.droppable]
        assert len(inferred) == 1
        assert inferred[0].sample_index == 63
        assert [d.sample_index for d in deps] == list(range(60, 63))
        assert sel.counts.decoded_dependency == 3

    def test_second_death_same_region_reuses(self):
        sel, emitted = self.mk(selector={"infer_i": False})
        feed_video(sel, 300)
        for i in range(300):
            req = {80: 2.1, 85: 2.05}.get(i)
            sel.on_mask_frame(i / 30.0, req)
        sel.finish()
        # Second request (2.05s) satisfied by the already scheduled 2.1s
        # frame in the same GoP (out already contains pts > 2.05).
        assert sel.counts.decoded_inference == 1

    def test_mark_seen_called(self):
        seen = []
        sel = FrameSelector(
            SelectorConfig(infer_i=False),
            SortConfig(max_age=5),
            fps=30.0,
            mark_seen=seen.append,
            emit=lambda f: None,
        )
        feed_video(sel, 300)
        for i in range(300):
            sel.on_mask_frame(i / 30.0, 2.1 if i == 80 else None)
        sel.finish()
        assert seen == [pytest.approx(63 / 30.0)]

    def test_alpha_beta_extra_decode(self):
        sel, emitted = self.mk(selector={"infer_i": False, "alpha": 6, "beta": 3})
        feed_video(sel, 300)
        for i in range(300):
            sel.on_mask_frame(i / 30.0, 2.1 if i == 80 else None)
        sel.finish()
        # beta=3 inference frames total: 1 base + 2 extra, alpha=6 extra
        # decodes spaced among them.
        assert sel.counts.decoded_inference == 3

    def test_counts_totals(self):
        sel, _ = self.mk(selector={"infer_i": False})
        feed_video(sel, 300)
        for i in range(300):
            sel.on_mask_frame(i / 30.0, 2.1 if i == 80 else None)
        sel.finish()
        c = sel.counts
        assert c.total == 300
        assert c.inference_filter_rate() == pytest.approx(1 - 1 / 300)


class _FakeOutputs:
    """Minimal stand-in for SortOutputs rows."""

    def __init__(self, mt):
        import numpy as np

        self.track_ltwh = np.zeros((mt, 4), np.float32)
        self.track_id = np.full(mt, -1, np.int32)
        self.track_id_post = np.full(mt, -1, np.int32)
        self.exists = np.zeros(mt, bool)
        self.active = np.zeros(mt, bool)
        self.predicted = np.zeros(mt, bool)
        self.matched_det = np.full(mt, -1, np.int32)
        self.det_track_id = np.full(8, -1, np.int32)
        self.death = np.zeros(mt, bool)
        self.death_id = np.full(mt, -1, np.int32)
        self.death_start = np.zeros(mt, np.int32)
        self.death_last_match = np.zeros(mt, np.int32)
        self.death_tsu = np.zeros(mt, np.int32)
        self.death_active = np.zeros(mt, bool)


class TestHostTracker:
    def test_history_and_death(self):
        dead = []
        ht = HostTracker(on_dead=dead.append)
        mt = 4
        # Frame 0: birth of track 0.
        o = _FakeOutputs(mt)
        o.exists[0] = True
        o.track_id_post[0] = 0
        assert ht.update(0.0, o) is None
        # Frames 1..4: predicted; at 4 death (active, start 0, lm 3, tsu 1).
        for t in range(1, 4):
            o = _FakeOutputs(mt)
            o.predicted[0] = True
            o.track_id[0] = 0
            o.track_id_post[0] = 0
            o.exists[0] = True
            o.active[0] = True
            o.track_ltwh[0] = [1.0 * t, 2.0, 3.0, 4.0]
            ht.update(float(t), o)
        o = _FakeOutputs(mt)
        o.predicted[0] = True
        o.track_id[0] = 0
        o.track_ltwh[0] = [9, 9, 3, 4]
        o.death[0] = True
        o.death_active[0] = True
        o.death_id[0] = 0
        o.death_start[0] = 0
        o.death_last_match[0] = 3
        o.death_tsu[0] = 1
        req = ht.update(4.0, o)
        assert req == 0.0  # dead & unseen -> max(start)=0
        assert len(dead) == 1
        rec = dead[0]
        assert rec.track_id == 0
        assert not rec.seen
        # history: frames 1,2,3,4 minus tsu=1 trim -> 1,2,3
        assert [h[0] for h in rec.history] == [1.0, 2.0, 3.0]

    def test_seen_suppresses_min_required(self):
        ht = HostTracker()
        mt = 2
        o = _FakeOutputs(mt)
        o.exists[0] = True
        o.track_id_post[0] = 0
        ht.update(0.0, o)
        for t in range(1, 3):
            o = _FakeOutputs(mt)
            o.predicted[0] = True
            o.track_id[0] = 0
            o.track_id_post[0] = 0
            o.exists[0] = True
            ht.update(float(t), o)
        ht.mark_seen(1.5)
        o = _FakeOutputs(mt)
        o.death[0] = True
        o.death_active[0] = True
        o.death_id[0] = 0
        o.death_start[0] = 0
        o.death_last_match[0] = 2
        req = ht.update(3.0, o)
        # Dead but seen (1.5 in [0, 2]) -> reference returns Some(0).
        assert req == 0.0
