"""MOG2 label generation (cova_tpu/utils/mog.py).

The reference builds BlobNet training labels with cv2 MOG2 +
morphology + a downsample to the MB grid (utils/generate-mog.py:28-60).
Here the pipeline is a jitted lax.scan; these tests pin the grid
derivation — including non-720p inputs, where the MB grid is
ceil(H/16) x ceil(W/16) (1080p -> 68x120) — and that an obviously
moving object against a static background is labeled foreground.
"""

import numpy as np
import pytest

from cova_tpu.utils.mog import generate_labels


def _moving_square_luma(f, h, w, size=48, step=6):
    rng = np.random.default_rng(0)
    bg = rng.integers(40, 60, size=(h, w), dtype=np.uint8)
    frames = np.repeat(bg[None], f, axis=0).copy()
    for i in range(f):
        x = (20 + i * step) % (w - size)
        y = h // 2
        frames[i, y : y + size, x : x + size] = 220
    return frames


class TestGenerateLabels:
    @pytest.mark.parametrize(
        "h,w,gh,gw",
        [
            (360, 640, 45, 80),  # 720p half-res -> 80x45 MB grid
            (540, 960, 68, 120),  # 1080p half-res -> 120x68 MB grid
            # 1080 has 67.5 MB rows; the half-row maps to grid row 67
        ],
    )
    def test_grid_shape_tracks_input(self, h, w, gh, gw):
        luma = _moving_square_luma(24, h, w)
        labels = generate_labels(luma)
        assert labels.shape == (24, gh, gw)
        assert labels.dtype == np.uint8
        assert set(np.unique(labels)).issubset({0, 1})

    def test_moving_object_labeled_foreground(self):
        luma = _moving_square_luma(30, 360, 640)
        labels = generate_labels(luma)
        # After the mixture has warmed up, the moving square (48 px at
        # half-res = 6 grid cells wide) must show up as foreground and
        # the static background must not be saturated with noise.
        tail = labels[10:]
        assert tail.sum() > 0
        assert tail.mean() < 0.2
