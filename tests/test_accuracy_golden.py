"""Golden accuracy regression (the reference's headline result).

The committed golden CSVs under golden/demo/ were produced by
`python examples/reproduce_accuracy.py` on the bundled demo clip with
the committed BlobNet weights (artifacts/blobnet_demo.npz) and
background model (artifacts/demo_bg.npy) — see ACCURACY.md. These tests
pin (a) the query-metric computation against the committed report and
(b) the stand-in oracle detector's determinism, so any drift in metrics
code, dataset config, or detector behavior fails loudly.

Reference analog: parse/accuracy.py:87-92 evaluated against downloaded
golden dnn.csv baselines (README.md:182-190).
"""

import json
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "golden" / "demo"


@pytest.fixture(scope="module")
def report():
    return json.loads((GOLDEN / "report.json").read_text())


class TestGoldenMetrics:
    def test_report_reproducible_from_csvs(self, report):
        """parse_query over the committed CSVs must reproduce the
        committed BP/GC numbers exactly (pure pandas, no device)."""
        from cova_tpu.query.datasets import DATASETS
        from cova_tpu.query.metrics import (
            load_boxes_csv,
            load_cova,
            parse_query,
        )

        gt = load_boxes_csv(GOLDEN / "dnn_gt.csv")
        cova = load_cova(GOLDEN)  # assoc.csv + stationary.csv
        ds = DATASETS["demo"]
        duration = 1802 / 30.0
        res = parse_query(
            gt,
            cova,
            duration,
            list(ds.targets),
            exclude=ds.exclude,
            region=ds.region,
            frame_size=ds.frame_size,
        )
        assert round(res.bp_accuracy, 4) == report["bp_accuracy"]
        assert round(res.gc_error, 4) == report["gc_error"]
        assert round(res.bp_accuracy_local, 4) == report["bp_accuracy_local"]
        assert round(res.gc_error_local, 4) == report["gc_error_local"]
        assert res.num_slots == report["num_slots"]

    def test_accuracy_within_reference_band(self, report):
        """The Table-4 analog: BP accuracy and GC error vs the
        full-decode oracle baseline, at the reference's tracker
        defaults (maxage 60 / minhits 30, launch.py:43-44). These
        bounds are the round-3 committed result (signed+nnz BlobNet,
        demo-tuned cc_threshold — ACCURACY.md) — regressions below
        them mean the compressed-domain stage or association got
        worse. The Table-3 analog filter rates are pinned too (the
        filtering is the system's reason to exist)."""
        assert report["bp_accuracy"] >= 0.90
        assert report["gc_error"] <= 0.025
        assert report["bp_accuracy_local"] >= 0.94
        assert report["gc_error_local"] <= 0.06
        assert report["inference_filter_rate"] >= 0.98
        assert report["decode_filter_rate"] >= 0.94
        assert report["dead_tracks"] == 24

    def test_gt_csv_shape(self):
        import pandas as pd

        gt = pd.read_csv(GOLDEN / "dnn_gt.csv")
        assert len(gt) == 8249
        assert set(gt.columns) >= {
            "left", "top", "width", "height", "timestamp", "class_id",
        }


class TestGoldenMetricsDemo2:
    """Second-dataset regression (VERDICT r2 next #4): the demo clip
    re-encoded CAVLC/keyint=100/bframes=2 (examples/make_dataset2.py),
    evaluated with the archie-style bus-target query over the 3-class
    stand-in oracle. Reference analog: parse/config.yaml's archie
    dataset + multi-day evaluation."""

    @pytest.fixture(scope="class")
    def report2(self):
        return json.loads((REPO / "golden" / "demo2" / "report.json").read_text())

    def test_report_reproducible_from_csvs(self, report2):
        from cova_tpu.query.datasets import DATASETS
        from cova_tpu.query.metrics import (
            load_boxes_csv,
            load_cova,
            parse_query,
        )

        g2 = REPO / "golden" / "demo2"
        gt = load_boxes_csv(g2 / "dnn_gt.csv")
        cova = load_cova(g2)
        ds = DATASETS["demo2"]
        # The evaluation grid depends on the container-pts duration
        # (re-encoded stream: B-frame pts delay), recorded in the report.
        duration = report2["duration_seconds"]
        res = parse_query(
            gt, cova, duration, list(ds.targets),
            exclude=ds.exclude, region=ds.region, frame_size=ds.frame_size,
        )
        assert round(res.bp_accuracy, 4) == report2["bp_accuracy"]
        assert round(res.gc_error, 4) == report2["gc_error"]
        assert round(res.bp_accuracy_local, 4) == report2["bp_accuracy_local"]
        assert round(res.gc_error_local, 4) == report2["gc_error_local"]

    def test_band(self, report2):
        # Bands trail the committed values (BP 0.9474 / GC 0.0105 /
        # decode filter 0.9861) by the same tight margin as demo's, so
        # the second dataset actually guards regressions (VERDICT r3).
        assert report2["bp_accuracy"] >= 0.945
        assert report2["gc_error"] <= 0.015
        assert report2["decode_filter_rate"] >= 0.985
        assert report2["inference_filter_rate"] >= 0.985
        # The GT must actually contain buses (class 5) — the 3-class
        # stand-in split is what the query targets.
        import pandas as pd

        gt = pd.read_csv(REPO / "golden" / "demo2" / "dnn_gt.csv")
        assert (gt.class_id == 5).sum() > 50
        assert set(gt.class_id.unique()) == {0, 2, 5}


class TestGoldenMetricsHoldout:
    """Held-out generalization regression (VERDICT r3 next #2):
    golden/demo_holdout/ was produced by
    `examples/reproduce_accuracy.py --holdout --golden` — BlobNet
    trained only on the clip's first 1200 frames
    (artifacts/blobnet_demo_holdout.npz) with knobs tuned scoring only
    that prefix, then evaluated on the unseen suffix [40 s, end).
    ACCURACY.md "Held-out evaluation" records the methodology and the
    honest read (BP transfers, GC undercounts)."""

    @pytest.fixture(scope="class")
    def reporth(self):
        return json.loads(
            (REPO / "golden" / "demo_holdout" / "report.json").read_text()
        )

    def test_report_reproducible_from_csvs(self, reporth):
        """The windowed parse_query over the committed CSVs must
        reproduce the committed prefix AND suffix rows exactly — this
        also pins the ts_start/ts_end grid windowing (slot values must
        stay float-identical to the full-clip grid)."""
        from cova_tpu.query.datasets import DATASETS
        from cova_tpu.query.metrics import (
            load_boxes_csv,
            load_cova,
            parse_query,
        )

        gt = load_boxes_csv(GOLDEN / "dnn_gt.csv")  # shared ground truth
        cova = load_cova(REPO / "golden" / "demo_holdout")
        ds = DATASETS["demo"]
        duration = 1802 / 30.0
        split = reporth["holdout_split_seconds"]
        for tag, win in (
            ("holdout", dict(ts_start=split)),
            ("prefix", dict(ts_end=split)),
            ("", {}),
        ):
            res = parse_query(
                gt, cova, duration, list(ds.targets),
                exclude=ds.exclude, region=ds.region,
                frame_size=ds.frame_size, **win,
            )
            sfx = f"_{tag}" if tag else ""
            assert round(res.bp_accuracy, 4) == reporth[f"bp_accuracy{sfx}"]
            assert round(res.gc_error, 4) == reporth[f"gc_error{sfx}"]
            assert res.num_slots == reporth[f"num_slots{sfx}"]
        # The windows partition the full grid.
        assert (
            reporth["num_slots_prefix"] + reporth["num_slots_holdout"]
            == reporth["num_slots"]
        )

    def test_holdout_band(self, reporth):
        # Bands trail the committed values (suffix BP 0.9221 /
        # GC 0.0862 / BPL 0.9619; prefix BP 0.9317 — the augmented
        # fine-tune protocol, ACCURACY.md "Augmented fine-tune") by the
        # same tight margin as the other goldens. The suffix GC band is
        # wider than the in-sample ones because the committed value IS
        # the honest generalization gap (undercount) — the band guards
        # against it growing back toward the pre-augmentation 0.2172.
        assert reporth["bp_accuracy_holdout"] >= 0.92
        assert reporth["gc_error_holdout"] <= 0.09
        assert reporth["bp_accuracy_local_holdout"] >= 0.955
        assert reporth["bp_accuracy_prefix"] >= 0.93
        assert reporth["decode_filter_rate"] >= 0.95
        assert reporth["inference_filter_rate"] >= 0.985


class TestSweepHarness:
    def test_replay_matches_pipeline_csvs(self, tmp_path):
        """The offline sweep harness (examples/sweep_accuracy.py) must
        write BYTE-IDENTICAL aggregator CSVs to a real CovaPipeline run
        of the same configuration — its host replay and GT-lookup
        shortcut stand in for the full pipeline during knob sweeps, so
        any drift here invalidates sweep conclusions. Runs on a clip
        prefix so the check is cheap on the CPU test platform (on TPU
        with the full clip the replay reproduces golden/demo/report.json
        exactly; see sweep_accuracy.py's __main__ validation)."""
        import os
        import sys

        if not os.path.exists("/root/reference/demo/1m.mp4"):
            pytest.skip("demo clip not available")
        sys.path.insert(0, str(REPO))
        import dataclasses

        from examples.sweep_accuracy import SweepContext, make_cfg
        from cova_tpu.models.bgdet import (
            StaticBackgroundDetector,
            load_background,
        )
        from cova_tpu.models.blobnet import load_artifact
        from cova_tpu.pipeline.cova import CovaPipeline

        nmax = 150
        _, variables, wmeta = load_artifact(
            REPO / "artifacts" / "blobnet_demo.npz"
        )
        use_nnz = bool(wmeta.get("use_nnz_channel", False))
        signed = bool(wmeta.get("signed_mv", False))
        cfg = make_cfg(max_age=10, min_hits=3, use_nnz=use_nnz)
        cfg = dataclasses.replace(
            cfg,
            compressed=dataclasses.replace(cfg.compressed, signed_mv=signed),
        )

        detector = StaticBackgroundDetector(
            load_background(REPO / "artifacts" / "demo_bg.npy")
        )
        pipe = CovaPipeline(
            "/root/reference/demo/1m.mp4", str(tmp_path / "pipe"), cfg,
            variables=variables, detector=detector, log=lambda *a: None,
        )
        pipe.run(max_frames=nmax)

        ctx = SweepContext(max_frames=nmax)
        probs = ctx.probs(
            REPO / "artifacts" / "blobnet_demo.npz",
            use_nnz=use_nnz, signed_mv=signed,
        )
        ctx.run_config(probs, cfg, out_dir=str(tmp_path / "replay"))

        for f in ("track", "dnn", "assoc", "stationary"):
            a = (tmp_path / "pipe" / f"{f}.csv").read_bytes()
            b = (tmp_path / "replay" / f"{f}.csv").read_bytes()
            assert a == b, f"{f}.csv differs between pipeline and replay"


class TestDetectorDeterminism:
    def test_same_frame_same_boxes(self):
        """The stand-in oracle is a pure function of (background, frame):
        the naive GT run and the cova pixel stage must agree bit-for-bit
        on shared frames."""
        from cova_tpu.models.bgdet import StaticBackgroundDetector

        rng = np.random.default_rng(0)
        bg = rng.integers(0, 256, (360, 640)).astype(np.uint8)
        det = StaticBackgroundDetector(bg)
        y = bg.repeat(2, axis=0).repeat(2, axis=1)  # full-res replica
        y = y.copy()
        y[100:180, 200:340] = 255  # a bright moving object
        a = det.detect_frame(1.0, y)
        b = det.detect_frame(1.0, y)
        assert a == b
        assert len(a) >= 1

    def test_committed_background_detects_demo_objects(self):
        """With the committed background, frame 150 of the demo clip
        contains the white van (a large class-2 component)."""
        demo = pathlib.Path("/root/reference/demo/1m.mp4")
        if not demo.exists():
            pytest.skip("demo clip not available")
        from cova_tpu.codec import Mp4Demuxer, PixelDecoder
        from cova_tpu.models.bgdet import (
            StaticBackgroundDetector,
            load_background,
        )

        bg = load_background(REPO / "artifacts" / "demo_bg.npy")
        det = StaticBackgroundDetector(bg)
        d = Mp4Demuxer(str(demo))
        dec = PixelDecoder(d.extradata())
        frames = []
        for i in range(160):
            dec.send(d.read_sample(i), d.sample(i).pts)
            got = dec.pop(d.width, d.height)
            while got is not None:
                frames.append(got)
                got = dec.pop(d.width, d.height)
        frames.sort(key=lambda f: f[0])
        pts, y, u, v = frames[150]
        boxes = det.detect_frame(pts / d.timescale, y)
        cars = [b for b in boxes if b.class_id == 2]
        assert cars, "the van must be detected as class 2"
        van = max(cars, key=lambda b: b.area)
        # Center roughly at the van's position (half-res 300-400, 170-240
        # -> full-res 600-800, 340-480).
        cx = van.left + van.width / 2
        cy = van.top + van.height / 2
        assert 550 <= cx <= 900 and 300 <= cy <= 550


class TestGoldenMetricsTuned:
    """The demo dataset's TUNED tracker operating point (wide knob
    sweep, ACCURACY.md): min_hits 35 / max_age 45 instead of the
    reference launch defaults, trading decode-filter rate (0.95 ->
    0.85) for BP 0.9074 -> 0.9373 and GC 0.0177 -> 0.0028 at the same
    inference cost. golden/demo_tuned/ was produced by
    `python examples/reproduce_accuracy.py --tuned --golden` and shares
    golden/demo/dnn_gt.csv (the ground truth is config-invariant)."""

    @pytest.fixture(scope="class")
    def report(self):
        return json.loads(
            (REPO / "golden" / "demo_tuned" / "report.json").read_text()
        )

    def test_report_reproducible_from_csvs(self, report):
        from cova_tpu.query.datasets import DATASETS
        from cova_tpu.query.metrics import (
            load_boxes_csv,
            load_cova,
            parse_query,
        )

        gt = load_boxes_csv(GOLDEN / "dnn_gt.csv")
        cova = load_cova(REPO / "golden" / "demo_tuned")
        ds = DATASETS["demo"]
        duration = 1802 / 30.0
        res = parse_query(
            gt, cova, duration, list(ds.targets),
            exclude=ds.exclude, region=ds.region, frame_size=ds.frame_size,
        )
        assert round(res.bp_accuracy, 4) == report["bp_accuracy"]
        assert round(res.gc_error, 4) == report["gc_error"]
        assert round(res.bp_accuracy_local, 4) == report["bp_accuracy_local"]
        assert round(res.gc_error_local, 4) == report["gc_error_local"]

    def test_tuned_band(self, report):
        assert report["bp_accuracy"] >= 0.93
        assert report["gc_error"] <= 0.01
        assert report["bp_accuracy_local"] >= 0.95
        assert report["inference_filter_rate"] >= 0.98
        assert report["decode_filter_rate"] >= 0.84
        assert report["dead_tracks"] == 25


class TestGoldenMetricsDemo1080:
    """Accuracy at the north star's stated operating point (VERDICT r4
    next #1): golden/demo1080/ was produced by
    `examples/reproduce_1080p.py --golden` on the 1080p evaluation
    stream (examples/make_dataset2.py build_1080p, 120x68 MB grid) with
    the 1080p-trained weights (artifacts/blobnet_demo1080.npz) at the
    committed operating point (mask 0.6 / cc 7 — ACCURACY.md "1080p").
    Together with BENCH_1080P.json (805.6 cpu-fps on the same stream)
    this pins BOTH halves of the north star on ONE configuration."""

    @pytest.fixture(scope="class")
    def report1080(self):
        return json.loads(
            (REPO / "golden" / "demo1080" / "report.json").read_text()
        )

    def test_report_reproducible_from_csvs(self, report1080):
        from cova_tpu.query.datasets import DATASETS
        from cova_tpu.query.metrics import (
            load_boxes_csv,
            load_cova,
            parse_query,
        )

        g = REPO / "golden" / "demo1080"
        gt = load_boxes_csv(g / "dnn_gt.csv")
        cova = load_cova(g)
        ds = DATASETS["demo1080"]
        res = parse_query(
            gt, cova, report1080["duration_seconds"], list(ds.targets),
            exclude=ds.exclude, region=ds.region, frame_size=ds.frame_size,
        )
        assert round(res.bp_accuracy, 4) == report1080["bp_accuracy"]
        assert round(res.gc_error, 4) == report1080["gc_error"]
        assert round(res.bp_accuracy_local, 4) == report1080["bp_accuracy_local"]
        assert round(res.gc_error_local, 4) == report1080["gc_error_local"]
        assert res.num_slots == report1080["num_slots"]

    def test_band_1080p(self, report1080):
        # Bands trail the committed values (BP 0.9118 / GC 0.0499,
        # ACCURACY.md "1080p") by the same tight margin as the other
        # goldens. The query exclusions/region scale 1.5x with the
        # resolution (query/datasets.py DEMO1080).
        assert report1080["bp_accuracy"] >= 0.91
        assert report1080["gc_error"] <= 0.055
        assert report1080["decode_filter_rate"] >= 0.96
        assert report1080["inference_filter_rate"] >= 0.99
        # The grid really is the 1080p one.
        assert "120x68" in report1080["resolution"]


class TestGoldenMetricsSynth:
    """Cross-scene regression (VERDICT r4 next #3): the procedural
    third scene (examples/make_synth.py — a genuinely different
    layout/background/motion corpus, first-party libx264-encoded),
    evaluated with synth-trained weights at the swept busy-scene
    operating point, committed by examples/reproduce_synth.py
    --golden. The report also pins the ZERO-SHOT transfer row
    (demo-trained weights, same scene/knobs) — the committed evidence
    that BlobNet weights are scene-specific, which is why the
    reference trains per scene (config/blobnet/*.txt). Scene and GT
    instrument are validated against the generator's exact object
    schedule (ACCURACY.md "Cross-scene")."""

    @pytest.fixture(scope="class")
    def reports(self):
        return json.loads(
            (REPO / "golden" / "synth" / "report.json").read_text()
        )

    def test_report_reproducible_from_csvs(self, reports):
        from cova_tpu.query.datasets import DATASETS
        from cova_tpu.query.metrics import (
            load_boxes_csv,
            load_cova,
            parse_query,
        )

        gs = REPO / "golden" / "synth"
        gt = load_boxes_csv(gs / "dnn_gt.csv")
        cova = load_cova(gs)
        ds = DATASETS["synth"]
        res = parse_query(
            gt, cova, reports["duration_seconds"], list(ds.targets),
            exclude=ds.exclude, region=ds.region, frame_size=ds.frame_size,
        )
        assert round(res.bp_accuracy, 4) == reports["bp_accuracy"]
        assert round(res.gc_error, 4) == reports["gc_error"]
        assert round(res.bp_accuracy_local, 4) == reports["bp_accuracy_local"]
        assert round(res.gc_error_local, 4) == reports["gc_error_local"]

    def test_band(self, reports):
        # Bands trail the committed values (BP 0.9878 / GC 1.5829 /
        # decode filter 0.6906 — the pareto-knee operating point,
        # examples/reproduce_synth.py docstring). GT steady state is
        # ~5.4 concurrent cars/slot, so GC here is ~29% relative —
        # the busy-scene counting envelope, not a regression band to
        # tighten by luck.
        assert reports["bp_accuracy"] >= 0.98
        assert reports["gc_error"] <= 1.7
        assert reports["decode_filter_rate"] >= 0.65
        assert reports["inference_filter_rate"] >= 0.98

    def test_zero_shot_gap_is_real(self, reports):
        # The committed reason per-scene training exists: demo-trained
        # weights on this scene lose >= 15 BP points and >= 1.5x GC
        # vs the in-domain row at identical knobs. If this gap ever
        # CLOSES, the corpus stopped discriminating (e.g. the scene
        # regressed to demo-like statistics) — that is a test failure
        # worth investigating, not a win.
        z = reports["zeroshot_demo_weights"]
        assert z["bp_accuracy"] <= reports["bp_accuracy"] - 0.15
        assert z["gc_error"] >= reports["gc_error"] * 1.5

    def test_gt_composition(self):
        import pandas as pd

        gt = pd.read_csv(REPO / "golden" / "synth" / "dnn_gt.csv")
        # All three oracle classes present: pedestrians/small (0),
        # cars (2), the bus (5).
        assert set(gt.class_id.unique()) == {0, 2, 5}
        assert (gt.class_id == 5).sum() > 50
        # Busy scene: steady-state concurrent cars well above demo's.
        per_ts = gt[gt.class_id == 2].groupby("timestamp").size()
        assert per_ts.mean() > 4.0
        # The stationary machinery fired (park-and-leave car).
        st = pd.read_csv(REPO / "golden" / "synth" / "stationary.csv")
        assert len(st) > 100
