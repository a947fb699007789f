"""YOLOv4 oracle tests: darknet weight-loader mapping and on-device
decode/NMS plumbing.

The loader mapping (reference: third_parties/tensorrt_demos yolo cfg +
darknet .weights serialization) is pinned mechanically here — layer
order, BN/bias grouping, OIHW->HWIO transpose, exact consumption of the
buffer. Accuracy against released yolov4.weights cannot be checked in
this environment (no network egress)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flax

from cova_tpu.models.yolov4 import (
    create_yolov4,
    load_darknet_weights,
    postprocess,
)

NC = 2  # small class count to keep heads light
S = 64  # input size for init (params are spatial-size independent)


@pytest.fixture(scope="module")
def model_and_vars():
    return create_yolov4(jax.random.PRNGKey(0), num_classes=NC, input_size=S)


def _conv_layers(variables):
    """(path, kernel_shape, has_bias) in creation order."""
    flat = flax.traverse_util.flatten_dict(variables["params"])
    out = []
    for p in flat:
        if p[-1] == "kernel":
            out.append((p[:-1], flat[p].shape, p[:-1] + ("bias",) in flat))
    return out


def _total_floats(variables):
    return sum(
        int(np.prod(x.shape))
        for tree in (variables["params"], variables["batch_stats"])
        for x in jax.tree_util.tree_leaves(tree)
    )


class TestDarknetLoader:
    def test_layer_order_matches_cfg(self, model_and_vars):
        """Creation order must walk yolov4.cfg: stem 32, CSP stage 1
        (64/route 64/main 64/block 32-64/post 64/transition 64), then
        stage 2 downsample 128... The darknet file is consumed in this
        order, so the progression pins the mapping."""
        _, variables = model_and_vars
        couts = [shape[-1] for _, shape, _ in _conv_layers(variables)]
        assert couts[:17] == [
            32,  # stem
            64, 64, 64, 32, 64, 64, 64,  # CSP stage 1
            128, 64, 64, 64, 64, 64, 64, 64, 128,  # CSP stage 2
        ]
        # three linear head convs, 3*(5+NC) channels each
        out_ch = 3 * (5 + NC)
        heads = [c for c in couts if c == out_ch]
        assert len(heads) == 3

    def test_synthetic_weights_roundtrip(self, model_and_vars, tmp_path):
        model, variables = model_and_vars
        total = _total_floats(variables)
        rng = np.random.default_rng(0)
        # Positive values keep BN variances valid; tiny magnitudes keep
        # 110 stacked mish convs from overflowing in the forward pass.
        buf = rng.uniform(1e-3, 3e-3, total).astype(np.float32)
        path = tmp_path / "synth.weights"
        with open(path, "wb") as f:
            f.write(np.asarray([0, 2, 5], np.int32).tobytes())  # version
            f.write(np.asarray([0], np.int64).tobytes())  # images seen
            f.write(buf.tobytes())

        loaded = load_darknet_weights(variables, str(path), num_classes=NC)

        # Shapes preserved everywhere.
        jax.tree_util.tree_map(
            lambda a, b: (_ for _ in ()).throw(
                AssertionError(f"{a.shape} vs {b.shape}")
            )
            if np.shape(a) != np.shape(b)
            else None,
            variables,
            loaded,
        )

        # First conv layer: stem ConvBN(32, 3x3) over 3 input channels.
        # File layout: bn_bias(32), bn_scale(32), bn_mean(32), bn_var(32),
        # then OIHW weights transposed to HWIO.
        flatp = flax.traverse_util.flatten_dict(loaded["params"])
        flats = flax.traverse_util.flatten_dict(loaded["batch_stats"])
        first_kernel = next(k for k in flatp if k[-1] == "kernel")
        parent = first_kernel[:-2]
        bn = next(
            k[len(parent)]
            for k in flatp
            if k[: len(parent)] == parent and "BatchNorm" in k[len(parent)]
        )
        np.testing.assert_array_equal(flatp[parent + (bn, "bias")], buf[0:32])
        np.testing.assert_array_equal(flatp[parent + (bn, "scale")], buf[32:64])
        np.testing.assert_array_equal(flats[parent + (bn, "mean")], buf[64:96])
        np.testing.assert_array_equal(flats[parent + (bn, "var")], buf[96:128])
        w = buf[128 : 128 + 32 * 3 * 3 * 3].reshape(32, 3, 3, 3)
        np.testing.assert_array_equal(
            flatp[first_kernel], np.transpose(w, (2, 3, 1, 0))
        )

        # The loaded model must still run (and the loader consumed the
        # whole buffer — it asserts internally).
        o3, o4, o5 = model.apply(
            loaded, jnp.zeros((1, S, S, 3)), train=False
        )
        out_ch = 3 * (5 + NC)
        assert o3.shape == (1, S // 8, S // 8, out_ch)
        assert o4.shape == (1, S // 16, S // 16, out_ch)
        assert o5.shape == (1, S // 32, S // 32, out_ch)
        assert all(bool(jnp.isfinite(o).all()) for o in (o3, o4, o5))

    def test_truncated_file_rejected(self, model_and_vars, tmp_path):
        _, variables = model_and_vars
        total = _total_floats(variables)
        path = tmp_path / "short.weights"
        with open(path, "wb") as f:
            f.write(np.zeros(5, np.int32).tobytes())
            f.write(np.ones(total - 7, np.float32).tobytes())
        with pytest.raises(ValueError, match="too short"):
            load_darknet_weights(variables, str(path), num_classes=NC)


class TestPostprocess:
    def test_decode_and_nms_shapes(self, model_and_vars):
        model, variables = model_and_vars
        outputs = model.apply(
            variables, jnp.zeros((2, S, S, 3)), train=False
        )
        boxes, scores, classes, valid = postprocess(
            outputs, num_classes=NC, input_size=S, max_detections=16
        )
        assert boxes.shape == (2, 16, 4)
        assert scores.shape == (2, 16)
        assert classes.shape == (2, 16)
        assert valid.shape == (2, 16)
