"""Associator tests (reference: analysis-aggregator/src/server/assoc.rs)."""

import csv
import math

import pytest

from cova_tpu.aggregator import Associator, BoxRec
from cova_tpu.config import AggregatorConfig
from cova_tpu.types import TrackRecord


def det(ts, l, t, w, h, cls, conf=0.9):
    return BoxRec(l, t, w, h, w * h, None, ts, cls, conf)


def read_csv(p):
    with open(p) as f:
        return list(csv.DictReader(f))


@pytest.fixture
def agg(tmp_path):
    a = Associator(tmp_path, AggregatorConfig(moving_iou=0.15, stationary_maxage=2.0))
    a.set_ranges([0.0])
    return a


def track_record(tid, frames):
    return TrackRecord(
        track_id=tid,
        start_ts=frames[0][0],
        end_ts=frames[-1][0],
        seen=True,
        history=frames,
    )


class TestAssociation:
    def test_moving_object_class_vote(self, agg, tmp_path):
        # Track at MB units (scaled x16): box (1,1,2,2) -> (16,16,32,32)px.
        hist = [(t / 10.0, (1.0, 1.0, 2.0, 2.0)) for t in range(10)]
        agg.submit_track(0.0, math.inf, track_record(1, hist))
        # Detections at matching timestamps/position, class 2 (x3), 7 (x1).
        agg.update_dnn([det(0.1, 14, 14, 36, 36, 2)])
        agg.update_dnn([det(0.2, 14, 14, 36, 36, 2)])
        agg.update_dnn([det(0.3, 14, 14, 36, 36, 2)])
        agg.update_dnn([det(0.4, 14, 14, 36, 36, 7)])
        agg.terminate()
        rows = read_csv(tmp_path / "assoc.csv")
        assert rows, "track should be finalized with a class"
        classes = {r["class_id"] for r in rows}
        assert classes == {"2"}  # majority vote; single 7 dropped
        assert len(rows) == 10  # full history written once per class

    def test_max_freq_one_emits_all(self, agg, tmp_path):
        hist = [(t / 10.0, (1.0, 1.0, 2.0, 2.0)) for t in range(5)]
        agg.submit_track(0.0, math.inf, track_record(1, hist))
        agg.update_dnn([det(0.1, 14, 14, 36, 36, 2)])
        agg.update_dnn([det(0.2, 14, 14, 36, 36, 7)])
        agg.terminate()
        rows = read_csv(tmp_path / "assoc.csv")
        classes = {r["class_id"] for r in rows}
        assert classes == {"2", "7"}  # all when max frequency is 1

    def test_unmatched_track_not_written(self, agg, tmp_path):
        hist = [(t / 10.0, (1.0, 1.0, 2.0, 2.0)) for t in range(5)]
        agg.submit_track(0.0, math.inf, track_record(1, hist))
        agg.terminate()
        assert read_csv(tmp_path / "assoc.csv") == []
        assert len(read_csv(tmp_path / "track.csv")) == 5

    def test_stationary_detection(self, agg, tmp_path):
        # Repeated unmatched detections at the same place, same class.
        for k in range(6):
            agg.update_dnn([det(k * 1.0, 100, 100, 50, 50, 2)])
        # Advance time far beyond stationary_maxage via another det.
        agg.update_dnn([det(30.0, 500, 500, 10, 10, 5)])
        agg.terminate()
        rows = read_csv(tmp_path / "stationary.csv")
        assert rows
        # 2-of-3 slot materialization: 0..5s at 100ms -> 50 steps x 2.
        assert len(rows) == 100
        assert all(r["class_id"] == "2" for r in rows)
        # Fresh id beyond any track id.
        assert int(rows[0]["track_id"]) >= 1

    def test_dnn_csv_written(self, agg, tmp_path):
        agg.update_dnn([det(0.1, 1, 2, 3, 4, 9)])
        agg.terminate()
        rows = read_csv(tmp_path / "dnn.csv")
        assert len(rows) == 1
        assert rows[0]["class_id"] == "9"


class TestBatchedDnnDelivery:
    """One big update_dnn batch (the pipeline delivers the whole pixel
    stage at EOS) must vote exactly like the reference's per-frame
    stream: finalization at a late timestamp must not run ahead of
    matching at earlier ones (round-2 regression — every track finalized
    voteless)."""

    def test_single_batch_matches_streamed(self, tmp_path):
        def run(dirname, batched):
            a = Associator(
                tmp_path / dirname,
                AggregatorConfig(moving_iou=0.15, stationary_maxage=2.0),
            )
            a.set_ranges([0.0])
            hist1 = [(t / 10.0, (1.0, 1.0, 2.0, 2.0)) for t in range(5)]
            hist2 = [(1.0 + t / 10.0, (4.0, 4.0, 2.0, 2.0)) for t in range(5)]
            a.submit_track(0.0, math.inf, track_record(1, hist1))
            a.submit_track(0.0, math.inf, track_record(2, hist2))
            dets = [
                det(0.1, 14, 14, 36, 36, 2),
                det(0.2, 14, 14, 36, 36, 2),
                det(1.1, 62, 62, 36, 36, 5),
                det(1.2, 62, 62, 36, 36, 5),
            ]
            if batched:
                a.update_dnn(dets)
            else:
                for d in dets:
                    a.update_dnn([d])
            a.terminate()
            return sorted(
                (r["track_id"], r["class_id"], r["timestamp"])
                for r in read_csv(tmp_path / dirname / "assoc.csv")
            )

        streamed = run("streamed", batched=False)
        batched = run("batched", batched=True)
        assert streamed, "streamed delivery must produce votes"
        assert batched == streamed

    def test_unsorted_batch(self, tmp_path):
        """Out-of-order timestamps inside one batch are re-ordered."""
        a = Associator(tmp_path / "uo", AggregatorConfig(moving_iou=0.15))
        a.set_ranges([0.0])
        hist = [(t / 10.0, (1.0, 1.0, 2.0, 2.0)) for t in range(5)]
        a.submit_track(0.0, math.inf, track_record(1, hist))
        a.update_dnn(
            [det(0.3, 14, 14, 36, 36, 2), det(0.1, 14, 14, 36, 36, 2)]
        )
        a.terminate()
        rows = read_csv(tmp_path / "uo" / "assoc.csv")
        assert {r["class_id"] for r in rows} == {"2"}
