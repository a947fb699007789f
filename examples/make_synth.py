#!/usr/bin/env python3
"""Synthesize a genuinely different third scene — the cross-scene
generalization corpus (VERDICT r4 next #3).

Every committed dataset so far derives from the single 60-second
amsterdam demo clip (demo2 = CAVLC re-encode, holdout = prefix/suffix
split, 1080p = upscale). The reference evaluates across 7 scenes
(reference: parse/config.yaml; config/blobnet/{amsterdam,archie,...}).
Offline, the only way to get a second SCENE is to make one: this
script renders a procedural fixed-camera intersection — different
layout, background texture, object sizes/speeds/trajectories from the
amsterdam roundabout — and encodes it with libx264 via the first-party
encode path (csrc/tools/encode_yuv + utils/mp4loop), producing a
conforming H.264/MP4 with real motion vectors, real residuals, real
GoP structure. No reference-derived pixels anywhere.

Scene (1280x720, 30 fps, default 1800 frames = 60 s, seed-determined):
  - static background: sky gradient, textured building blocks with
    windows, a HORIZONTAL road (the demo's roundabout has no straight
    horizontal road) and a VERTICAL cross street, lane markings;
  - cars (class "car" at the stand-in oracle's area knobs): rounded-
    luminance rectangles, varied tone/size/speed, both directions in
    both roads, spawn schedule from the seed;
  - one bus-sized vehicle crossing slowly (exercises the bus/class-5
    voting when evaluated with bus_area like demo2);
  - pedestrians: small slow movers along the sidewalk (below the
    oracle's min_area -> must NOT become tracks);
  - one car that enters, PARKS for ~20 s on the shoulder, then leaves
    (exercises the aggregator's stationary machinery).

Usage: python examples/make_synth.py [OUT.mp4] [frames] [--seed N]
Default: /tmp/cova_synth/synth.mp4, 1800 frames.
"""

import os
import pathlib
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = pathlib.Path(__file__).resolve().parent.parent
W, H = 1280, 720
FPS = 30


def build_background(rng):
    """Static scene plate: (H, W) luma + (H/2, W/2) u/v."""
    y = np.zeros((H, W), np.float32)
    # Sky gradient.
    y[:] = np.linspace(150, 110, H)[:, None]
    # Building blocks along the top: textured rectangles with windows.
    x = 0
    while x < W:
        bw = int(rng.integers(90, 220))
        bh = int(rng.integers(140, 260))
        tone = float(rng.integers(60, 120))
        y[0:bh, x : x + bw] = tone + rng.normal(0, 3, (bh, min(bw, W - x)))
        # Window grid.
        for wy in range(18, bh - 12, 34):
            for wx in range(12, bw - 14, 30):
                if x + wx + 14 < W:
                    y[wy : wy + 16, x + wx : x + wx + 14] = tone + 45
        x += bw + int(rng.integers(6, 22))
    # Horizontal road band (the main street) + sidewalks.
    road_top, road_bot = 360, 560
    y[road_top - 24 : road_top] = 135  # upper sidewalk
    y[road_bot : road_bot + 24] = 135  # lower sidewalk
    y[road_top:road_bot] = 88 + rng.normal(0, 2.5, (road_bot - road_top, W))
    # Lane markings (dashed center line).
    for x0 in range(0, W, 60):
        y[456:464, x0 : x0 + 30] = 200
    # Vertical cross street.
    vx0, vx1 = 860, 1020
    y[0:road_top, vx0:vx1] = 90 + rng.normal(0, 2.5, (road_top, vx1 - vx0))
    y[road_bot:, vx0:vx1] = 90 + rng.normal(
        0, 2.5, (H - road_bot, vx1 - vx0)
    )
    for y0 in range(0, H, 60):
        y[y0 : y0 + 30, 936:944] = 200
    # Ground below the road.
    y[road_bot + 24 :] += rng.normal(0, 2, (H - road_bot - 24, W))
    u = np.full((H // 2, W // 2), 128, np.float32)
    v = np.full((H // 2, W // 2), 128, np.float32)
    # Slight warm tint on buildings, cool on road.
    v[: road_top // 2] += 4
    u[road_top // 2 : road_bot // 2] += 3
    return y, u, v


def sprite(w, h, tone, rng):
    """Rounded-luminance vehicle sprite with a darker skirt and a
    windshield band — enough structure for real MVs and residuals."""
    s = np.full((h, w), tone, np.float32)
    s += rng.normal(0, 2, (h, w))
    yy = np.linspace(-1, 1, h)[:, None]
    xx = np.linspace(-1, 1, w)[None, :]
    s *= 1.0 - 0.25 * (yy**2 + 0.3 * xx**2)
    s[int(h * 0.15) : int(h * 0.4), int(w * 0.2) : int(w * 0.8)] = (
        tone * 0.45
    )  # windshield
    s[int(h * 0.8) :] *= 0.6  # skirt/wheels
    return np.clip(s, 8, 245)


class Mover:
    def __init__(self, spr, path_fn, t0, t1, chroma=(0.0, 0.0)):
        self.spr = spr
        self.path_fn = path_fn  # frame -> (left, top) floats
        self.t0, self.t1 = t0, t1
        self.chroma = chroma

    def draw(self, i, y, u, v):
        if not (self.t0 <= i < self.t1):
            return
        left, top = self.path_fn(i)
        h, w = self.spr.shape
        l, t = int(round(left)), int(round(top))
        if l + w <= 0 or l >= W or t + h <= 0 or t >= H:
            return
        x0, y0 = max(0, l), max(0, t)
        x1, y1 = min(W, l + w), min(H, t + h)
        y[y0:y1, x0:x1] = self.spr[y0 - t : y1 - t, x0 - l : x1 - l]
        if self.chroma != (0.0, 0.0):
            cu, cv = self.chroma
            u[y0 // 2 : y1 // 2, x0 // 2 : x1 // 2] = 128 + cu
            v[y0 // 2 : y1 // 2, x0 // 2 : x1 // 2] = 128 + cv


def build_movers(rng, frames):
    movers = []
    lanes_right = [380, 420]  # top of sprite, moving +x
    lanes_left = [480, 520]  # moving -x

    def h_path(speed, lane, start_x):
        return lambda i, s=speed, l=lane, x=start_x: (x + s * i, l)

    # Cars on the main street, staggered spawns both directions.
    t = 0
    while t < frames - 60:
        speed = float(rng.uniform(3.0, 8.0))
        w = int(rng.integers(70, 120))
        h = int(rng.integers(34, 52))
        tone = float(rng.integers(140, 235))
        lane = int(rng.choice(lanes_right))
        spr = sprite(w, h, tone, rng)
        movers.append(
            Mover(spr, h_path(speed, lane, -w - speed * t), t,
                  frames, chroma=(float(rng.integers(-12, 12)),
                                  float(rng.integers(-12, 12))))
        )
        t += int(rng.integers(45, 120))
    t = 20
    while t < frames - 60:
        speed = -float(rng.uniform(3.0, 7.0))
        w = int(rng.integers(70, 120))
        h = int(rng.integers(34, 52))
        tone = float(rng.integers(30, 70))  # dark cars the other way
        lane = int(rng.choice(lanes_left))
        spr = sprite(w, h, tone, rng)
        movers.append(
            Mover(spr, h_path(speed, lane, W - speed * t), t, frames,
                  chroma=(float(rng.integers(-12, 12)),
                          float(rng.integers(-12, 12))))
        )
        t += int(rng.integers(50, 130))

    # Vertical cross-street cars.
    def v_path(speed, x, start_y):
        return lambda i, s=speed, xx=x, y0=start_y: (xx, y0 + s * i)

    for t0 in range(40, frames - 120, 300):
        speed = float(rng.uniform(2.5, 5.0))
        spr = sprite(48, 78, float(rng.integers(120, 200)), rng)
        movers.append(
            Mover(spr, v_path(speed, 880, -80 - speed * t0), t0, frames)
        )
    # One slow bus (big -> class 5 at bus_area knobs).
    bus = sprite(210, 64, 225, rng)
    movers.append(Mover(bus, h_path(2.0, 404, -210 - 2.0 * 150), 150,
                        frames, chroma=(-20.0, 18.0)))

    # Parking car: drives in, parks on the shoulder ~20 s, drives off.
    park_spr = sprite(92, 42, 205, rng)
    p_in, p_stop, p_go, p_out = 300, 420, 1020, 1140
    park_x_stop = 560.0

    def park_path(i):
        if i < p_stop:
            return (park_x_stop - 4.0 * (p_stop - i), 332.0)
        if i < p_go:
            return (park_x_stop, 332.0)
        return (park_x_stop + 4.0 * (i - p_go), 332.0)

    movers.append(Mover(park_spr, park_path, p_in, p_out,
                        chroma=(10.0, -14.0)))

    # Pedestrians: small slow movers on the sidewalks (below the
    # oracle's min_area — must not become detections).
    for t0 in range(0, frames - 200, 260):
        spr = sprite(14, 30, float(rng.integers(90, 180)), rng)
        movers.append(Mover(spr, h_path(0.9, 336, -14 - 0.9 * t0), t0,
                            frames))
    return movers


def render(out_mp4, frames=1800, seed=11):
    rng = np.random.default_rng(seed)
    bg_y, bg_u, bg_v = build_background(rng)
    movers = build_movers(rng, frames)

    out_mp4 = pathlib.Path(out_mp4)
    out_mp4.parent.mkdir(parents=True, exist_ok=True)
    tool = REPO / "cova_tpu" / "csrc" / "tools" / "encode_yuv"
    if not tool.exists():
        subprocess.run(
            ["make", "-s", "-C", str(REPO / "cova_tpu" / "csrc"),
             "tools/encode_yuv"],
            check=True,
        )
    rec = str(out_mp4) + ".rec"
    proc = subprocess.Popen(
        [str(tool), "-", rec, f"{W}x{H}", "", "23"],
        stdin=subprocess.PIPE,
    )
    # Per-frame sensor noise comes from a SEPARATE per-frame generator
    # so object schedules stay seed-stable if the noise model changes.
    nrng = np.random.default_rng(seed + 1)
    for i in range(frames):
        y = bg_y.copy()
        u = bg_u.copy()
        v = bg_v.copy()
        for m in movers:
            m.draw(i, y, u, v)
        y += nrng.normal(0, 1.2, y.shape)  # sensor noise
        proc.stdin.write(np.clip(y, 0, 255).astype(np.uint8).tobytes())
        proc.stdin.write(np.clip(u, 0, 255).astype(np.uint8).tobytes())
        proc.stdin.write(np.clip(v, 0, 255).astype(np.uint8).tobytes())
    proc.stdin.close()
    if proc.wait() != 0:
        raise RuntimeError("encode_yuv failed")

    from cova_tpu.utils.mp4loop import mux_rec_to_mp4

    tmp = str(out_mp4) + ".tmp"
    n = mux_rec_to_mp4(rec, tmp)
    os.unlink(rec)
    os.replace(tmp, str(out_mp4))
    print(f"wrote {out_mp4}: {n} samples (synthetic scene, seed {seed})")
    return str(out_mp4)


def build_synth(out_mp4="/tmp/cova_synth/synth.mp4", frames=1800, seed=11):
    """Cached build (validated like make_dataset2.build_1080p)."""
    if os.path.exists(out_mp4):
        try:
            from cova_tpu.codec import Mp4Demuxer

            d = Mp4Demuxer(out_mp4)
            if (d.width, d.height, d.num_samples) == (W, H, frames):
                return out_mp4
        except Exception:
            pass
        os.unlink(out_mp4)
    return render(out_mp4, frames=frames, seed=seed)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "/tmp/cova_synth/synth.mp4"
    frames = int(args[1]) if len(args) > 1 else 1800
    seed = 11
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    render(out, frames=frames, seed=seed)
