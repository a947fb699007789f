#!/usr/bin/env python3
"""One-command reproduction of the demo-clip accuracy report.

The reference's headline result (paper Table 4) is BP/GC query accuracy
of the CoVA pipeline vs a full-decode oracle baseline, plus the Table-3
filter rates (reference: parse/accuracy.py:79-92). This script produces
the same report end to end on the bundled demo clip, fully offline and
deterministically:

  1. ground truth: full decode of every frame -> stand-in oracle
     detector (static-background subtraction; cova_tpu/models/bgdet.py)
     -> dnn.csv  (reference: pipeline/naive);
  2. CoVA: entropy decode -> BlobNet (committed trained weights) -> CC
     -> SORT -> frame selector -> selective pixel decode -> the SAME
     detector on the few selected frames -> aggregator CSVs
     (reference: pipeline/cova + analysis-aggregator);
  3. query metrics: BP/GC global + local-quadrant with the dataset's
     exclusion regions (reference: parse/parse.py).

Usage:
  python examples/reproduce_accuracy.py [OUT_DIR] [VIDEO] [--golden]
      [--tuned | --holdout]

--tuned selects the demo dataset's tuned TRACKER operating point
(min_hits 35, max_age 45; found by the offline knob sweep,
examples/sweep_accuracy.py — ACCURACY.md "wide sweep") instead of the
reference launch defaults (min_hits 30, max_age 60). With --golden the
tuned run refreshes golden/demo_tuned/ rather than golden/demo/.

--holdout runs the HELD-OUT generalization configuration: BlobNet
weights trained only on the clip's first 1200 frames (40 s) — since
round 5 fine-tuned with the synthetic CROSS-SCENE corpus mixed into
the mirrored views (examples/finetune_augment.py --extra; the synth
scene shares nothing with the demo suffix, so no leakage) — with
knobs tuned scoring only that prefix
(artifacts/blobnet_demo_holdout.npz, ACCURACY.md "held-out"), then
reports the query metrics separately for the training prefix
[0, 40 s) and the UNSEEN suffix [40 s, end) — the offline analog of
the reference's train-one-day/evaluate-other-days methodology
(reference: parse/accuracy.py:27-92). With --golden it refreshes
golden/demo_holdout/.

Writes OUT_DIR/{naive/dnn.csv, cova/*.csv, report.json} and prints the
Table-3/4-style report. Expected numbers are committed in ACCURACY.md
and pinned by tests/test_accuracy_golden.py. --golden additionally
copies {dnn_gt.csv, assoc.csv, stationary.csv, report.json} into
golden/demo/ (the committed regression goldens).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = pathlib.Path(__file__).resolve().parent.parent
BG_PATH = REPO / "artifacts" / "demo_bg.npy"
WEIGHTS = REPO / "artifacts" / "blobnet_demo.npz"
HOLDOUT_WEIGHTS = pathlib.Path(os.environ.get(
    "COVA_HOLDOUT_WEIGHTS",  # experiment override (sweeps/augmentation)
    REPO / "artifacts" / "blobnet_demo_holdout.npz"))
HOLDOUT_SPLIT_FRAMES = 1200  # train/tune prefix; suffix is held out
HOLDOUT_SPLIT_SECONDS = HOLDOUT_SPLIT_FRAMES / 30.0
# Tuned by the offline sweep scoring ONLY the training prefix [0, 40 s)
# with the prefix-trained synth-augmented fine-tune weights: the same
# knob families the committed tuned point swept (cc_threshold x
# min_hits x max_age at the reference mask_threshold 0.5), winner by
# (BP desc, GC asc) on the prefix — BP 0.9342 / GC 0.0408. The suffix
# scores never entered the choice (ACCURACY.md "held-out"; earlier
# protocol winners: cc=2 at prefix BP 0.9050 pre-augmentation, then
# cc=3/mh=35 under the mirror-only fine-tune at prefix BP 0.9317).
HOLDOUT_CC_THRESHOLD = 2
HOLDOUT_MIN_HITS = 25
HOLDOUT_MAX_AGE = 45


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    golden = "--golden" in sys.argv
    tuned = "--tuned" in sys.argv
    holdout = "--holdout" in sys.argv
    if tuned and holdout:
        sys.exit("--tuned and --holdout are mutually exclusive")
    out_dir = pathlib.Path(args[0] if len(args) > 0 else "/tmp/cova_accuracy")
    video = args[1] if len(args) > 1 else "/root/reference/demo/1m.mp4"
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax
    import numpy as np

    from cova_tpu.codec import Mp4Demuxer
    from cova_tpu.config import CovaConfig
    from cova_tpu.models.bgdet import (
        StaticBackgroundDetector,
        build_background,
        load_background,
        save_background,
    )
    from cova_tpu.pipeline.cova import CovaPipeline
    from cova_tpu.pipeline.naive import NaivePipeline
    from cova_tpu.query.datasets import DATASETS
    from cova_tpu.query.metrics import load_boxes_csv, load_cova, parse_query

    # -- background model (deterministic; committed artifact preferred) --
    if BG_PATH.exists():
        bg = load_background(BG_PATH)
        print(f"loaded background model {BG_PATH}")
    else:
        bg = build_background(video)
        save_background(BG_PATH, bg)
        print(f"built + saved background model {BG_PATH}")
    detector = StaticBackgroundDetector(bg)

    demux = Mp4Demuxer(video)
    duration = (demux.sample(demux.num_samples - 1).pts / demux.timescale) + (
        1.0 / 30.0
    )
    demux.close()

    # -- 1. naive full-decode ground truth --------------------------------
    print("== naive baseline (full decode, every frame) ==")
    naive = NaivePipeline(video, str(out_dir / "naive"), detector)
    nres = naive.run()
    print(
        f"naive: {nres.num_frames} frames, {nres.num_detections} detections,"
        f" {nres.elapsed_seconds:.1f}s"
    )

    # -- 2. CoVA run with the committed trained BlobNet -------------------
    print("== cova pipeline (compressed domain + selective decode) ==")
    from cova_tpu.models.blobnet import load_artifact

    weights_path = HOLDOUT_WEIGHTS if holdout else WEIGHTS
    _, variables, wmeta = load_artifact(weights_path)
    print(f"weights contract: {wmeta or '3ch |mv| (legacy)'}")
    # The demo clip has only 8 GoPs; 4 ranges give the frame selector a
    # 2-GoP walk per range (8 ranges would degenerate to one GoP each,
    # pinning every scheduled decode to the range's I-frame). Tracker
    # knobs are the reference launch defaults (maxage 60, minhits 30).
    from cova_tpu.config import CompressedStageConfig, ParallelConfig

    # cc_threshold=3 is the demo dataset's tuned knob (ACCURACY.md knob
    # sweep; the reference likewise tunes the CC area threshold and the
    # segmentation threshold per dataset — experiment/cova/config.yaml
    # cova_cc_threshold + config/blobnet/<dataset>.txt). mask_threshold
    # stays at the reference default 0.5; all tracker and selector knobs
    # stay at the reference launch defaults. The metadata channels
    # (nnz 4th channel, signed MVs) follow the weight artifact.
    from cova_tpu.config import SortConfig

    sort_cfg = SortConfig()
    if tuned:
        # The demo dataset's tuned tracker operating point (wide sweep,
        # ACCURACY.md): shorter coasting + longer confirmation trades
        # BP 0.9074 -> 0.9373 and GC 0.0177 -> 0.0028 on this clip at
        # the same inference cost. The primary golden stays at the
        # reference launch defaults for comparability.
        sort_cfg = SortConfig(max_age=45, min_hits=35)
    # In holdout mode every tuned knob comes from the sweep harness
    # scoring ONLY the training prefix [0, 40 s) with the prefix-trained
    # weights (run_config(..., ts_end=40.0)), so no knob has seen the
    # held-out suffix.
    if holdout:
        sort_cfg = SortConfig(
            max_age=HOLDOUT_MAX_AGE, min_hits=HOLDOUT_MIN_HITS
        )
    cc = HOLDOUT_CC_THRESHOLD if holdout else 3
    cfg = CovaConfig(
        parallel=ParallelConfig(num_ranges=4),
        sort=sort_cfg,
        compressed=CompressedStageConfig(
            cc_threshold=cc,
            use_nnz_channel=bool(wmeta.get("use_nnz_channel", False)),
            signed_mv=bool(wmeta.get("signed_mv", False)),
        ),
    )
    pipe = CovaPipeline(
        video, str(out_dir / "cova"), cfg, variables=variables, detector=detector
    )
    cres = pipe.run()
    print(
        f"cova: {cres.num_frames} frames in {cres.elapsed_seconds:.1f}s, "
        f"dead tracks {cres.dead_tracks}"
    )

    # -- 3. query metrics --------------------------------------------------
    ds = DATASETS["demo"]
    gt = load_boxes_csv(out_dir / "naive" / "dnn.csv")
    cova_df = load_cova(out_dir / "cova")
    res = parse_query(
        gt,
        cova_df,
        duration,
        list(ds.targets),
        exclude=ds.exclude,
        region=ds.region,
        frame_size=ds.frame_size,
    )

    report = {
        "bp_accuracy": round(res.bp_accuracy, 4),
        "gc_error": round(res.gc_error, 4),
        "bp_accuracy_local": round(res.bp_accuracy_local, 4),
        "gc_error_local": round(res.gc_error_local, 4),
        "num_slots": res.num_slots,
        "decode_filter_rate": round(cres.decode_filter_rate, 4),
        "inference_filter_rate": round(cres.inference_filter_rate, 4),
        "frames": cres.num_frames,
        "naive_detections": nres.num_detections,
        "dead_tracks": cres.dead_tracks,
    }
    if holdout:
        # The held-out rows: the same run scored only on the unseen
        # suffix [split, end) and, for contrast, on the training prefix.
        split = HOLDOUT_SPLIT_SECONDS
        for tag, win in (
            ("holdout", dict(ts_start=split)),
            ("prefix", dict(ts_end=split)),
        ):
            r = parse_query(
                gt, cova_df, duration, list(ds.targets),
                exclude=ds.exclude, region=ds.region,
                frame_size=ds.frame_size, **win,
            )
            report[f"bp_accuracy_{tag}"] = round(r.bp_accuracy, 4)
            report[f"gc_error_{tag}"] = round(r.gc_error, 4)
            report[f"bp_accuracy_local_{tag}"] = round(r.bp_accuracy_local, 4)
            report[f"gc_error_local_{tag}"] = round(r.gc_error_local, 4)
            report[f"num_slots_{tag}"] = r.num_slots
        report["holdout_split_seconds"] = split
        report["holdout_split_frames"] = HOLDOUT_SPLIT_FRAMES
    (out_dir / "report.json").write_text(json.dumps(report, indent=1))
    if golden:
        import shutil

        gname = "demo_tuned" if tuned else ("demo_holdout" if holdout else "demo")
        gdir = REPO / "golden" / gname
        gdir.mkdir(parents=True, exist_ok=True)
        if not (tuned or holdout):  # both variants share golden/demo/dnn_gt.csv
            shutil.copy(out_dir / "naive" / "dnn.csv", gdir / "dnn_gt.csv")
        shutil.copy(out_dir / "cova" / "assoc.csv", gdir / "assoc.csv")
        shutil.copy(out_dir / "cova" / "stationary.csv", gdir / "stationary.csv")
        shutil.copy(out_dir / "report.json", gdir / "report.json")
        print(f"golden CSVs refreshed under {gdir}")
    print("== report (Table 3/4 analog) ==")
    print(f"BP accuracy:         {report['bp_accuracy']:.4f}")
    print(f"GC error:            {report['gc_error']:.4f}")
    print(f"BP accuracy (local): {report['bp_accuracy_local']:.4f}")
    print(f"GC error (local):    {report['gc_error_local']:.4f}")
    print(f"decode filter rate:    {report['decode_filter_rate']:.4f}")
    print(f"inference filter rate: {report['inference_filter_rate']:.4f}")
    if holdout:
        print(
            f"held-out suffix [{HOLDOUT_SPLIT_SECONDS:.0f}s, end): "
            f"BP {report['bp_accuracy_holdout']:.4f} "
            f"GC {report['gc_error_holdout']:.4f} "
            f"(local {report['bp_accuracy_local_holdout']:.4f} / "
            f"{report['gc_error_local_holdout']:.4f})"
        )
        print(
            f"training prefix [0, {HOLDOUT_SPLIT_SECONDS:.0f}s): "
            f"BP {report['bp_accuracy_prefix']:.4f} "
            f"GC {report['gc_error_prefix']:.4f}"
        )
    print(f"report written to {out_dir / 'report.json'}")


if __name__ == "__main__":
    main()
