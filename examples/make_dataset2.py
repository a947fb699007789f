#!/usr/bin/env python3
"""Build the second evaluation dataset: the demo clip re-encoded with a
structurally different bitstream (CAVLC entropy coding, keyint=100,
bframes=2, ref=2 vs the original's CABAC / ~250-frame GoPs / 3-ref
pyramid) — the offline stand-in for the reference's multi-dataset
corpus (reference: parse/config.yaml days per dataset). Every selector,
decoder and aggregator default is thereby validated against a second
content-identical but bitstream-different input (VERDICT r2 next #4).

Deterministic given the image's libx264 build: the re-encode tool
(csrc/tools/reencode.cc) decodes with libavcodec and encodes with fixed
settings; the muxer is first-party (utils/mp4loop.py).

Usage: python examples/make_dataset2.py [OUT.mp4] [SRC.mp4] [x264opts] [crf]
Default output: /tmp/cova_ds2/demo2.mp4
"""

import os
import pathlib
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = pathlib.Path(__file__).resolve().parent.parent
X264OPTS = "cabac=0:keyint=100:bframes=2:ref=2"


def build(out_mp4, src="/root/reference/demo/1m.mp4", x264opts=X264OPTS,
          crf="23", scale=None):
    out_mp4 = pathlib.Path(out_mp4)
    out_mp4.parent.mkdir(parents=True, exist_ok=True)
    tool = REPO / "cova_tpu" / "csrc" / "tools" / "reencode"
    if not tool.exists():
        subprocess.run(
            ["make", "-s", "-C", str(REPO / "cova_tpu" / "csrc"),
             "tools/reencode"],
            check=True,
        )
    rec = str(out_mp4) + ".rec"
    cmd = [str(tool), src, rec, x264opts, crf]
    if scale:
        cmd += ["-1", scale]
    subprocess.run(cmd, check=True)
    from cova_tpu.utils.mp4loop import mux_rec_to_mp4

    # Write to a temp name, then rename: a crashed re-encode/mux must
    # not leave a partial file at the cacheable path (ADVICE r4).
    tmp = str(out_mp4) + ".tmp"
    n = mux_rec_to_mp4(rec, tmp)
    os.unlink(rec)
    os.replace(tmp, str(out_mp4))
    print(f"wrote {out_mp4}: {n} samples ({x264opts or 'x264 defaults'}, "
          f"crf {crf}{', ' + scale if scale else ''})")
    return str(out_mp4)


def build_1080p(out_mp4="/tmp/cova_1080p/demo1080.mp4",
                src="/root/reference/demo/1m.mp4"):
    """The 1080p evaluation stream for the BASELINE.md north star
    (>=10x real-time @1080p): the demo clip upscaled to 1920x1080
    (libswscale bicubic) and re-encoded with plain x264 defaults
    (CABAC, keyint 250, b-pyramid) — the same bitstream shape as the
    original demo encode, at the stated operating resolution.
    Cached: an existing output is reused (deterministic given the
    image's libx264) — but only after validating it actually is the
    documented recipe's output (1920x1080, same sample count as the
    source): a stale or partial file from an older recipe would
    silently re-point every COVA_BENCH_INPUT=1080p capture at a
    different bitstream (ADVICE r4)."""
    if os.path.exists(out_mp4):
        try:
            from cova_tpu.codec import Mp4Demuxer

            d = Mp4Demuxer(out_mp4)
            ok = d.width == 1920 and d.height == 1080
            if ok:
                ok = d.num_samples == Mp4Demuxer(src).num_samples
        except Exception:
            ok = False
        if ok:
            return out_mp4
        print(f"cached {out_mp4} fails validation (stale recipe or "
              "partial write) — rebuilding", file=sys.stderr)
        os.unlink(out_mp4)
    return build(out_mp4, src=src, x264opts="", crf="23",
                 scale="1920x1080")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cova_ds2/demo2.mp4"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/demo/1m.mp4"
    opts = sys.argv[3] if len(sys.argv) > 3 else X264OPTS
    crf = sys.argv[4] if len(sys.argv) > 4 else "23"
    build(out, src, opts, crf)
