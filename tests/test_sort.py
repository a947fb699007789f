"""SORT tracker tests — ports of the reference cargo tests
(cova-rs/sort/src/lib.rs:227-408, tracker/mod.rs:154-165) on the batched
JAX implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from cova_tpu.config import SortConfig
from cova_tpu.tracker import sort_init, sort_step
from cova_tpu.tracker.kalman import (
    bbox_to_z,
    kalman_init,
    kalman_predict,
    kalman_update,
    x_to_bbox,
)
from cova_tpu.types import Boxes, boxes_from_numpy

# Reference Sort::default(): max_age 3, min_hits 3, iou 0.2.
CFG = SortConfig(iou_threshold=0.2, max_age=3, min_hits=3, max_tracks=16)


def mk_dets(arr):
    return boxes_from_numpy(np.asarray(arr, np.float32), k=8)


def step(state, arr, ts):
    return sort_step(state, mk_dets(arr), jnp.asarray(ts, jnp.int32), CFG)


class TestKalman:
    def test_init_roundtrip(self):
        # Reference test_new_sort: initial state equals the detection.
        z = bbox_to_z(jnp.asarray([0.0, 0.0, 2.0, 2.0]))
        mean, cov = kalman_init(z)
        box = np.asarray(x_to_bbox(mean))
        assert box == pytest.approx([0.0, 0.0, 2.0, 2.0], abs=1e-5)

    def test_predict_keeps_position(self):
        # Reference test_obeservation_model: first predict returns the
        # same bbox (zero velocities).
        z = bbox_to_z(jnp.asarray([1.0, 1.0, 2.0, 2.0]))
        mean, cov = kalman_init(z)
        mean_p, _ = kalman_predict(mean, cov)
        box = np.asarray(x_to_bbox(mean_p))
        assert box == pytest.approx([1.0, 1.0, 2.0, 2.0], abs=1e-5)

    def test_update_moves_toward_measurement(self):
        z0 = bbox_to_z(jnp.asarray([0.0, 0.0, 2.0, 2.0]))
        mean, cov = kalman_init(z0)
        mean_p, cov_p = kalman_predict(mean, cov)
        z1 = bbox_to_z(jnp.asarray([1.0, 1.0, 2.0, 2.0]))
        mean_u, _ = kalman_update(mean_p, cov_p, z1)
        box = np.asarray(x_to_bbox(mean_u))
        assert 0.5 < box[0] < 1.01  # pulled toward x=1

    def test_from_x_quirk(self):
        # Wide box: w=4, h=1 -> quirk top = cy - w/2 instead of cy - h/2.
        x = jnp.asarray([2.0, 2.0, 4.0, 4.0, 0.0, 0.0, 0.0])  # s=4, r=4 -> w=4,h=1
        quirky = np.asarray(x_to_bbox(x, True))
        correct = np.asarray(x_to_bbox(x, False))
        assert quirky[1] == pytest.approx(0.0)  # 2 - 4/2
        assert correct[1] == pytest.approx(1.5)  # 2 - 1/2


class TestSortLifecycle:
    def test_new_tracks(self):
        # Reference test_new_sort.
        state = sort_init(CFG.max_tracks)
        state, out = step(state, [[0, 0, 2, 2], [1, 1, 2, 2]], 0)
        assert int(state.frame_count) == 1
        assert int(state.exists.sum()) == 2
        assert state.track_id[np.asarray(state.exists)].tolist() == [0, 1]
        # Initial states equal the detections.
        boxes = np.asarray(x_to_bbox(state.mean))
        assert boxes[0] == pytest.approx([0, 0, 2, 2], abs=1e-5)
        assert boxes[1] == pytest.approx([1, 1, 2, 2], abs=1e-5)

    def test_match_and_update(self):
        state = sort_init(CFG.max_tracks)
        state, _ = step(state, [[0, 0, 4, 4], [1, 1, 4, 4]], 0)
        # Reference test_match_dets: 2 new (inactive) tracks vs 3 dets;
        # only the IoU=1 pair survives the inactive threshold.
        state, out = step(state, [[1, 1, 4, 4], [2, 2, 4, 4], [3, 3, 4, 4]], 1)
        md = np.asarray(out.matched_det)
        assert md[1] == 0  # track slot 1 matched det 0
        assert md[0] == -1  # cost 2 - iou(0.143) = 1.857 > 1.8 rejected
        # Unmatched dets 1, 2 become new tracks.
        assert int(state.exists.sum()) == 4

    def test_activation_after_min_hits(self):
        state = sort_init(CFG.max_tracks)
        box = [[10, 10, 5, 5]]
        for t in range(4):
            state, out = step(state, box, t)
        # Birth at t=0, streak grows on t=1,2,3 -> active at streak 3.
        assert bool(state.active[0])

    def test_death_without_confirm(self):
        # A track that never reaches streak 5 keeps accruing
        # time_since_update and dies after max_age frames.
        state = sort_init(CFG.max_tracks)
        state, _ = step(state, [[10, 10, 5, 5]], 0)
        deaths = []
        for t in range(1, 6):
            state, out = step(state, [], t)
            deaths.append(np.asarray(out.death).copy())
        assert deaths[3][0]  # tsu: 1,2,3,4 > max_age=3 at t=4
        assert not bool(state.exists[0])

    def test_confirmed_track_survives(self):
        state = sort_init(CFG.max_tracks)
        box = [[10, 10, 5, 5]]
        state, _ = step(state, box, 0)
        for t in range(1, 6):
            state, _ = step(state, box, t)  # streak reaches 5 at t=5
        assert int(state.time_since_update[0]) == 0
        assert int(state.last_match[0]) == 5

    def test_dead_active_track_reported(self):
        # max_age >= 4 so the track survives to a 5-streak (the reference
        # only resets time_since_update once hit_streaks >= 5,
        # tracker/mod.rs:76-80 — with smaller max_age even continuously
        # matched tracks die at age max_age+1).
        cfg = SortConfig(iou_threshold=0.2, max_age=4, min_hits=2, max_tracks=8)
        state = sort_init(cfg.max_tracks)
        box = [[10, 10, 5, 5]]
        for t in range(6):
            state, out = sort_step(
                state, mk_dets(box), jnp.asarray(t, jnp.int32), cfg
            )
        assert bool(state.active[0])
        # Now disappear; death after tsu > 4.
        got_death = False
        for t in range(6, 14):
            state, out = sort_step(
                state, mk_dets([]), jnp.asarray(t, jnp.int32), cfg
            )
            d = np.asarray(out.death)
            if d.any():
                got_death = True
                assert bool(out.death_active[0])
                assert int(out.death_id[0]) == 0
                assert int(out.death_start[0]) == 0
                # confirmed at t=4 (streak 5), last match t=5
                assert int(out.death_last_match[0]) == 5
                break
        assert got_death

    def test_birth_reuses_dead_slot(self):
        cfg = SortConfig(iou_threshold=0.2, max_age=0, min_hits=1, max_tracks=4)
        state = sort_init(cfg.max_tracks)
        state, _ = sort_step(
            state, mk_dets([[0, 0, 2, 2]]), jnp.asarray(0, jnp.int32), cfg
        )
        # No dets: track dies (max_age=0); far det is born same frame.
        state, out = sort_step(
            state, mk_dets([[50, 50, 2, 2]]), jnp.asarray(1, jnp.int32), cfg
        )
        assert int(state.exists.sum()) == 1
        assert int(state.track_id[np.asarray(state.exists)][0]) == 1

    def test_id_counter_monotonic(self):
        state = sort_init(CFG.max_tracks)
        state, _ = step(state, [[0, 0, 2, 2], [10, 10, 2, 2]], 0)
        state, _ = step(state, [[30, 30, 2, 2]], 1)
        assert int(state.id_counter) == 3

    def test_tracking_moving_object(self):
        # A box moving right at 1 unit/frame stays one track (max_age >= 4
        # so the 5-streak confirmation is reachable; see
        # test_dead_active_track_reported).
        cfg = SortConfig(iou_threshold=0.2, max_age=5, min_hits=3, max_tracks=16)
        state = sort_init(cfg.max_tracks)
        for t in range(10):
            state, out = sort_step(
                state, mk_dets([[10 + t, 10, 6, 6]]), jnp.asarray(t, jnp.int32), cfg
            )
        assert int(state.exists.sum()) == 1
        assert int(state.hits[0]) == 9
        assert int(state.time_since_update[0]) == 0  # confirmed resets tsu
        # Predicted position tracks the motion.
        pred = np.asarray(out.track_ltwh[0])
        assert pred[0] == pytest.approx(19, abs=1.0)

    def test_reference_default_maxage_lifecycle(self):
        # With the reference's default max_age=3 a continuously matched
        # track still dies at age 4 (streak never reaches the 5-streak
        # confirmation before time_since_update exceeds max_age) and its
        # detections respawn a new track the following frame.
        state = sort_init(CFG.max_tracks)
        for t in range(10):
            state, out = step(state, [[10 + t, 10, 6, 6]], t)
        assert int(state.exists.sum()) == 0  # second track died at t=9
        assert int(state.id_counter) == 2
