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
