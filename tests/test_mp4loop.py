"""Looping MP4 re-muxer (long-stream soak support, examples/soak.py).

The reference's long-run coverage is multi-day real footage
(parse/config.yaml); offline we synthesize length by repeating the
demo's sample table with shifted timestamps over shared mdat bytes.
"""

import os

import numpy as np
import pytest

DEMO = "/root/reference/demo/1m.mp4"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEMO), reason="demo clip not available"
)


@pytest.fixture(scope="module")
def looped(tmp_path_factory):
    from cova_tpu.utils.mp4loop import write_looped_mp4

    path = tmp_path_factory.mktemp("loop") / "loop3.mp4"
    n = write_looped_mp4(DEMO, str(path), 3)
    return str(path), n


class TestLoopedMp4:
    def test_tables_scale(self, looped):
        from cova_tpu.codec import Mp4Demuxer

        path, n = looped
        a = Mp4Demuxer(DEMO)
        b = Mp4Demuxer(path)
        assert b.num_samples == 3 * a.num_samples == n
        assert len(b.gops()) == 3 * len(a.gops())
        assert (a.width, a.height, a.timescale) == (
            b.width, b.height, b.timescale,
        )
        # Same encoded bytes, shifted clock, preserved keyframes.
        assert b.read_sample(a.num_samples + 7) == a.read_sample(7)
        assert b.sample(a.num_samples).keyframe
        sa, sb = a.sample(5), b.sample(5 + a.num_samples)
        assert sb.dts > sa.dts and (sb.pts - sb.dts) == (sa.pts - sa.dts)
        a.close()
        b.close()

    def test_display_order_monotonic_pts(self, looped):
        from cova_tpu.codec import Mp4Demuxer

        path, n = looped
        d = Mp4Demuxer(path)
        order = d.display_order(0, n)
        pts = np.array([d.sample(int(i)).pts for i in order])
        assert (np.diff(pts) > 0).all()
        d.close()

    def test_metadata_identical_across_reps(self, looped):
        """Entropy decode of repetition k must equal repetition 0 —
        the looped stream is a pure timestamp shift."""
        from cova_tpu.codec import Mp4Demuxer

        path, _ = looped
        a = Mp4Demuxer(DEMO)
        b = Mp4Demuxer(path)
        idx = np.arange(0, 60, dtype=np.int32)
        m0 = b.entropy_decode_packed(idx, threads=4)
        m2 = b.entropy_decode_packed(idx + 2 * a.num_samples, threads=4)
        np.testing.assert_array_equal(m0, m2)
        ma = a.entropy_decode_packed(idx, threads=4)
        np.testing.assert_array_equal(m0, ma)
        a.close()
        b.close()


class TestReencodeMux:
    """Re-encode tool + first-party muxer (second-dataset machinery,
    examples/make_dataset2.py; reference analog: the multi-dataset
    corpus of parse/config.yaml)."""

    def test_reencode_cavlc_roundtrip(self, tmp_path):
        import pathlib
        import subprocess

        from cova_tpu.utils.mp4loop import mux_rec_to_mp4

        csrc = pathlib.Path(__file__).parent.parent / "cova_tpu" / "csrc"
        subprocess.run(
            ["make", "-s", "-C", str(csrc), "tools/reencode"], check=True
        )
        rec = tmp_path / "out.rec"
        subprocess.run(
            [
                str(csrc / "tools" / "reencode"), DEMO, str(rec),
                "cabac=0:keyint=25:bframes=2:ref=2", "23", "100",
            ],
            check=True, capture_output=True,
        )
        dst = tmp_path / "out.mp4"
        n = mux_rec_to_mp4(str(rec), str(dst))
        assert n == 100

        from cova_tpu.codec import Mp4Demuxer, PixelDecoder

        d = Mp4Demuxer(str(dst))
        assert d.num_samples == 100
        assert (d.width, d.height) == (1280, 720)
        assert len(d.gops()) >= 3  # keyint=25 over 100 frames
        # CAVLC: entropy_coding_mode_flag must be 0 in the muxed PPS.
        ed = d.extradata()
        import struct as _s

        i = 5
        nsps = ed[i] & 0x1F
        i += 1
        for _ in range(nsps):
            ln = _s.unpack(">H", ed[i : i + 2])[0]
            i += 2 + ln
        i += 1  # pps count
        ln = _s.unpack(">H", ed[i : i + 2])[0]
        pps = ed[i + 2 : i + 2 + ln]
        assert (pps[1] >> 5) & 1 == 0, "expected CAVLC"

        # First-party entropy decode over the whole re-encode.
        meta = d.entropy_decode_indices(
            np.arange(100, dtype=np.int32), threads=4
        )
        assert (meta["slice_type"] == 255).sum() == 0
        assert set(np.unique(meta["slice_type"])) <= {0, 1, 2}

        # And libavcodec can pixel-decode the muxed file.
        dec = PixelDecoder(d.extradata())
        got = None
        for k in range(10):
            dec.send(d.read_sample(k), d.sample(k).pts)
            got = got or dec.pop(d.width, d.height)
        assert got is not None and got[1].shape == (720, 1280)
        d.close()
