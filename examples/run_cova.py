#!/usr/bin/env python3
"""Run the end-to-end CoVA pipeline on a video.

Equivalent of the reference's `python launch.py INPUT OUTPUT DATASET`
(reference: experiment/cova/launch.py). Without trained weights the
BlobNet is randomly initialized and the oracle is a stub detector, so
the run exercises plumbing + filter rates, not accuracy.

Usage: python examples/run_cova.py INPUT.mp4 OUTPUT_DIR [max_frames_per_range]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from cova_tpu.config import CovaConfig
    from cova_tpu.pipeline.cova import CovaPipeline

    input_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/demo/1m.mp4"
    output_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cova_out"
    max_frames = int(sys.argv[3]) if len(sys.argv) > 3 else None
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default_npz = os.path.join(repo, "artifacts", "blobnet_demo.npz")
    ckpt = os.environ.get("COVA_BLOBNET_CKPT")

    import jax

    from cova_tpu.models.blobnet import (
        create_blobnet,
        load_artifact,
        load_params_npz,
    )

    variables = None
    wmeta = {}
    if ckpt and ckpt.endswith(".npz"):
        _, variables, wmeta = load_artifact(ckpt)
        print(f"loaded BlobNet weights from {ckpt} ({wmeta or '3ch'})")
    elif ckpt:
        import orbax.checkpoint as ocp

        _, template = create_blobnet(jax.random.PRNGKey(0))
        variables = ocp.StandardCheckpointer().restore(
            os.path.abspath(ckpt), template
        )
        print(f"loaded BlobNet weights from {ckpt}")
    elif os.path.exists(default_npz):
        _, variables, wmeta = load_artifact(default_npz)
        print(f"loaded committed BlobNet weights {default_npz} ({wmeta or '3ch'})")

    # Optional real oracle: COVA_YOLO_WEIGHTS=yolov4.weights (darknet);
    # COVA_YOLO_CFG=yolov4.cfg builds the topology from the cfg file the
    # weights were trained for (other darknet variants load too).
    detector = None
    yolo = os.environ.get("COVA_YOLO_WEIGHTS")
    if yolo:
        from cova_tpu.models.yolov4 import make_yolo_detector

        detector = make_yolo_detector(
            yolo, cfg_path=os.environ.get("COVA_YOLO_CFG")
        )
        print(f"using YOLOv4 oracle from {yolo}")

    import dataclasses

    cfg = CovaConfig()
    if wmeta:
        # Metadata channels follow the weight artifact's stored contract.
        cfg = dataclasses.replace(
            cfg,
            compressed=dataclasses.replace(
                cfg.compressed,
                use_nnz_channel=bool(wmeta.get("use_nnz_channel", False)),
                signed_mv=bool(wmeta.get("signed_mv", False)),
            ),
        )
    pipe = CovaPipeline(
        input_path, output_dir, cfg, variables=variables, detector=detector
    )
    result = pipe.run(max_frames=max_frames)

    total = result.num_frames
    print(f"Elapsed seconds: {result.elapsed_seconds:.2f}")
    print(f"Frames: {total} ({total / max(result.elapsed_seconds, 1e-9):.0f} fps)")
    print(
        f"Dropped: {result.dropped}, decoded (dependency): "
        f"{result.decoded_dependency}, decoded (inference): "
        f"{result.decoded_inference}"
    )
    print(f"Decode filter rate: {result.decode_filter_rate:.3f}")
    print(f"Inference filter rate: {result.inference_filter_rate:.3f}")
    print(f"Dead tracks reported: {result.dead_tracks}")
    tm = result.timers
    print(
        f"Stage seconds: entdec={tm.entropy_decode:.2f} "
        f"device={tm.device_dispatch:.2f} mirror={tm.host_mirror:.2f} "
        f"pixel={tm.pixel_stage:.2f}"
    )
    print(f"CSV outputs in {output_dir}: track, dnn, assoc, stationary")


if __name__ == "__main__":
    main()
