#!/usr/bin/env python3
"""Multi-input experiment launcher + per-day accuracy aggregation.

The reference runs each day of a dataset through the pipeline from a
templated YAML config (experiment/cova/launch.py: port allocation,
{}-templating, aggregator subprocess per run) and then evaluates every
day in parallel with ray (parse/accuracy.py:27-92). Here a single
process drives all inputs sequentially — the jitted device program
compiles once and is reused across inputs, and the aggregator is
in-process — and writes a per-day + summary report.

Experiment config (YAML or JSON):

    output_root: /tmp/cova_exp
    dataset: demo                 # query config (cova_tpu/query/datasets.py)
    inputs:                       # one entry per day/video; strings or
      - /data/amsterdam/day1.mp4  # dicts with per-input overrides:
      - path: /tmp/cova_ds2/demo2.mp4
        dataset: demo2            #   per-input query config
        generate: dataset2        #   build via make_dataset2 if missing
        bus_area: 2500            #   3-class stand-in oracle split
    ground_truth: naive           # "naive" = run the full-decode
                                  # baseline per input; or a directory
                                  # with <stem>.csv files, or absent to
                                  # skip accuracy
    blobnet_weights: artifacts/blobnet_demo.npz
    cova:                         # optional CovaConfig overrides
      parallel: {num_ranges: 4}

Usage: python examples/run_experiment.py EXPERIMENT.yaml
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_experiment(path):
    text = pathlib.Path(path).read_text()
    if str(path).endswith((".yaml", ".yml")):
        import yaml

        return yaml.safe_load(text)
    return json.loads(text)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    exp = load_experiment(sys.argv[1])

    import jax

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

    root = pathlib.Path(exp["output_root"])
    root.mkdir(parents=True, exist_ok=True)
    cfg = CovaConfig.from_dict(exp.get("cova", {}))
    gt_mode = exp.get("ground_truth")

    variables = None
    if exp.get("blobnet_weights"):
        import dataclasses

        from cova_tpu.models.blobnet import load_artifact

        _, variables, wmeta = load_artifact(exp["blobnet_weights"])
        print(f"loaded BlobNet weights {exp['blobnet_weights']} ({wmeta or '3ch'})")
        if wmeta:
            cfg = dataclasses.replace(
                cfg,
                compressed=dataclasses.replace(
                    cfg.compressed,
                    use_nnz_channel=bool(wmeta.get("use_nnz_channel", False)),
                    signed_mv=bool(wmeta.get("signed_mv", False)),
                ),
            )

    summary = {"inputs": [], "mean": {}}
    for entry_cfg in exp["inputs"]:
        if isinstance(entry_cfg, str):
            entry_cfg = {"path": entry_cfg}
        video = entry_cfg["path"]
        ds = DATASETS[entry_cfg.get("dataset", exp.get("dataset", "demo"))]
        if entry_cfg.get("generate") == "dataset2" and not os.path.exists(video):
            from examples.make_dataset2 import build as build_ds2

            build_ds2(video)
        elif entry_cfg.get("generate") == "synth":
            from examples.make_synth import build_synth

            build_synth(video)  # cached, recipe-validated
        stem = pathlib.Path(video).stem
        out = root / stem
        out.mkdir(parents=True, exist_ok=True)
        print(f"== {stem}: {video} ==")

        demux = Mp4Demuxer(video)
        duration = (
            demux.sample(demux.num_samples - 1).pts / demux.timescale
            + 1.0 / cfg.video.fps
        )
        demux.close()

        # Deterministic stand-in oracle per input (median-luma
        # background; reference setups use YOLOv4 here).
        bg_path = out / "background.npy"
        if bg_path.exists():
            bg = load_background(bg_path)
        else:
            bg = build_background(video)
            save_background(bg_path, bg)
        det = StaticBackgroundDetector(
            bg, bus_area=entry_cfg.get("bus_area")
        )

        def detector(frames, det=det):
            recs = []
            for ts, y, u, v in frames:
                recs.extend(det.detect_frame(ts, y))
            return recs

        gt_csv = None
        if gt_mode == "naive":
            gt_csv = out / "naive" / "dnn.csv"
            if not gt_csv.exists():
                nres = NaivePipeline(video, str(out / "naive"), det).run()
                print(
                    f"  naive GT: {nres.num_detections} detections in "
                    f"{nres.elapsed_seconds:.1f}s"
                )
        elif gt_mode:
            cand = pathlib.Path(gt_mode) / f"{stem}.csv"
            gt_csv = cand if cand.exists() else None

        pipe = CovaPipeline(
            video, str(out / "cova"), cfg, variables=variables,
            detector=detector,
        )
        res = pipe.run()
        entry = {
            "input": video,
            "frames": res.num_frames,
            "elapsed_seconds": round(res.elapsed_seconds, 2),
            "decode_filter_rate": round(res.decode_filter_rate, 4),
            "inference_filter_rate": round(res.inference_filter_rate, 4),
            "dead_tracks": res.dead_tracks,
        }
        print(
            f"  cova: {res.num_frames} frames in {res.elapsed_seconds:.1f}s, "
            f"filters {res.decode_filter_rate:.3f}/"
            f"{res.inference_filter_rate:.3f}"
        )

        if gt_csv is not None:
            gt = load_boxes_csv(gt_csv)
            cova_df = load_cova(out / "cova")
            q = parse_query(
                gt, cova_df, duration, list(ds.targets),
                exclude=ds.exclude, region=ds.region,
                frame_size=ds.frame_size,
            )
            entry.update(
                bp_accuracy=round(q.bp_accuracy, 4),
                gc_error=round(q.gc_error, 4),
                bp_accuracy_local=round(q.bp_accuracy_local, 4),
                gc_error_local=round(q.gc_error_local, 4),
            )
            print(
                f"  BP {q.bp_accuracy:.4f}  GC {q.gc_error:.4f}  "
                f"BPL {q.bp_accuracy_local:.4f}  GCL {q.gc_error_local:.4f}"
            )
        summary["inputs"].append(entry)

    # Dataset-level means (the reference prints per-day then averages).
    keys = [
        "bp_accuracy", "gc_error", "bp_accuracy_local", "gc_error_local",
        "decode_filter_rate", "inference_filter_rate",
    ]
    for k in keys:
        vals = [e[k] for e in summary["inputs"] if k in e]
        if vals:
            summary["mean"][k] = round(sum(vals) / len(vals), 4)
    (root / "summary.json").write_text(json.dumps(summary, indent=1))
    print(f"summary written to {root / 'summary.json'}")
    if summary["mean"]:
        print("means:", json.dumps(summary["mean"]))


if __name__ == "__main__":
    main()
