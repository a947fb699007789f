"""Darknet .cfg parser + generic graph executor in Flax.

The reference builds its YOLOv4 TensorRT engine from the darknet
cfg/weights pair (reference: config/dnn/yolov4_b2.txt engine built by
third_parties/tensorrt_demos' yolo_to_onnx, which parses yolov4.cfg).
Hand-transcribing the topology (models/yolov4.py YOLOv4) risks silent
drift from the file the released weights were trained for; this module
removes that risk by executing the cfg's layer list directly — and
makes other darknet variants (yolov4-tiny, yolov3, custom) loadable.

Supported sections: [net], [convolutional], [route] (multi-input
concat + groups/group_id), [shortcut], [maxpool], [upsample], [yolo].
Weight loading reuses the darknet order contract (bn_bias, bn_scale,
mean, var, conv kernel per BN conv; bias, kernel per linear conv) over
the cfg's conv order.

tests/test_yolov4.py pins DarknetModel(yolov4.cfg) numerically against
the hand-written YOLOv4 module under identical weights — two
independent transcriptions of the same topology must agree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def parse_cfg(path_or_text: str) -> list[dict]:
    """Parse a darknet cfg into a list of {type, **options} dicts (the
    [net] section first, then layers in execution order)."""
    if "\n" in path_or_text or "[" == path_or_text.strip()[:1]:
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    sections: list[dict] = []
    for raw in text.splitlines():
        line = raw.split("#")[0].split(";")[0].strip()
        if not line:
            continue
        if line.startswith("["):
            sections.append({"type": line.strip("[]").strip()})
        elif "=" in line and sections:
            k, v = line.split("=", 1)
            sections[-1][k.strip()] = v.strip()
    return sections


def _ints(s: str) -> list[int]:
    return [int(x) for x in s.replace(",", " ").split()]


def _floats(s: str) -> list[float]:
    return [float(x) for x in s.replace(",", " ").split()]


@dataclasses.dataclass(frozen=True)
class YoloHead:
    """One [yolo] section's decode parameters."""

    anchors: tuple  # ((w, h), ...) for this head's mask
    scale_xy: float
    classes: int
    layer_index: int  # which model output this head decodes


class DarknetModel(nn.Module):
    """Executes a parsed darknet cfg. Returns the raw outputs of the
    layers feeding each [yolo] section, in cfg order (same contract as
    YOLOv4.__call__: decode with cova_tpu.models.yolov4.decode_head)."""

    layers: tuple  # parsed sections as a tuple of frozen dicts' items
    dtype: Any = jnp.float32

    @staticmethod
    def from_cfg(path_or_text: str, dtype=jnp.float32):
        secs = parse_cfg(path_or_text)
        if not secs or secs[0]["type"] not in ("net", "network"):
            raise ValueError("cfg must start with a [net] section")
        layers = tuple(tuple(sorted(s.items())) for s in secs)
        return DarknetModel(layers=layers, dtype=dtype)

    def heads(self) -> list[YoloHead]:
        out = []
        for i, items in enumerate(self.layers[1:]):
            s = dict(items)
            if s["type"] != "yolo":
                continue
            anchors = _ints(s["anchors"])
            mask = _ints(s["mask"])
            pairs = [(anchors[2 * m], anchors[2 * m + 1]) for m in mask]
            out.append(
                YoloHead(
                    anchors=tuple(pairs),
                    scale_xy=float(s.get("scale_x_y", 1.0)),
                    classes=int(s.get("classes", 80)),
                    layer_index=len(out),
                )
            )
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        outputs: list = []  # per darknet layer index
        yolo_outputs: list = []
        for items in self.layers[1:]:
            s = dict(items)
            t = s["type"]
            if t == "convolutional":
                f = int(s["filters"])
                k = int(s.get("size", 1))
                stride = int(s.get("stride", 1))
                bn = int(s.get("batch_normalize", 0)) == 1
                act = s.get("activation", "linear")
                pad = (
                    "SAME" if stride == 1 else [(k // 2,) * 2] * 2
                )
                x = nn.Conv(
                    f, (k, k), strides=(stride, stride), padding=pad,
                    use_bias=not bn, dtype=dt,
                )(x)
                if bn:
                    x = nn.BatchNorm(
                        use_running_average=not train, dtype=dt
                    )(x)
                if act == "mish":
                    x = x * jnp.tanh(jax.nn.softplus(x))
                elif act == "leaky":
                    x = nn.leaky_relu(x, 0.1)
                elif act in ("linear", "logistic"):
                    if act == "logistic":
                        x = jax.nn.sigmoid(x)
                else:
                    raise ValueError(f"unsupported activation {act!r}")
                outputs.append(x)
            elif t == "route":
                idxs = _ints(s["layers"])
                srcs = [
                    outputs[i if i >= 0 else len(outputs) + i] for i in idxs
                ]
                x = (
                    srcs[0]
                    if len(srcs) == 1
                    else jnp.concatenate(srcs, axis=-1)
                )
                groups = int(s.get("groups", 1))
                if groups > 1:
                    gid = int(s.get("group_id", 0))
                    step = x.shape[-1] // groups
                    x = x[..., gid * step : (gid + 1) * step]
                outputs.append(x)
            elif t == "shortcut":
                i = int(s["from"])
                src = outputs[i if i >= 0 else len(outputs) + i]
                x = x + src
                act = s.get("activation", "linear")
                if act == "leaky":
                    x = nn.leaky_relu(x, 0.1)
                elif act != "linear":
                    raise ValueError(f"unsupported shortcut act {act!r}")
                outputs.append(x)
            elif t == "maxpool":
                k = int(s.get("size", 2))
                stride = int(s.get("stride", k))
                x = nn.max_pool(
                    x, (k, k), strides=(stride, stride), padding="SAME"
                )
                outputs.append(x)
            elif t == "upsample":
                stride = int(s.get("stride", 2))
                b, h, w, c = x.shape
                x = jax.image.resize(
                    x, (b, h * stride, w * stride, c), "nearest"
                )
                outputs.append(x)
            elif t == "yolo":
                yolo_outputs.append(x)
                outputs.append(x)  # darknet indexes yolo layers too
            else:
                raise ValueError(f"unsupported section [{t}]")
        return tuple(yolo_outputs)


def create_darknet(rng, cfg_path: str, input_size: Optional[int] = None,
                   dtype=jnp.float32):
    """Build (model, variables, heads) from a cfg file. input_size
    defaults to the cfg's [net] width/height."""
    model = DarknetModel.from_cfg(cfg_path, dtype)
    net = dict(model.layers[0])
    size = input_size or int(net.get("width", 608))
    dummy = jnp.zeros((1, size, size, int(net.get("channels", 3))),
                      jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables, model.heads()


def postprocess_darknet(
    outputs,
    heads: list[YoloHead],
    input_size: int,
    score_threshold: float = 0.25,
    nms_iou: float = 0.2,
    max_detections: int = 64,
    pre_nms_top: int = 512,
):
    """Decode cfg-declared heads + class-aware NMS (anchors, strides and
    scale_x_y all come from the cfg, not hardcoded tables)."""
    from cova_tpu.models.yolov4 import decode_head
    from cova_tpu.ops.nms import batched_nms

    boxes_all, scores_all = [], []
    for raw, head in zip(outputs, heads):
        stride = input_size // raw.shape[1]
        bx, sc = decode_head(
            raw, head.anchors, stride, head.scale_xy, head.classes,
            input_size,
        )
        boxes_all.append(bx)
        scores_all.append(sc)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    best = jnp.max(scores, axis=-1)
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)

    def per_image(bx, sc, cl):
        k = min(pre_nms_top, sc.shape[0])
        top = jax.lax.top_k(sc, k)[1]
        return batched_nms(
            bx[top], sc[top], cl[top], nms_iou, score_threshold,
            max_detections,
        )

    return jax.vmap(per_image)(boxes, best, cls)


def load_darknet_weights_cfg(variables, path):
    """Load darknet .weights into a DarknetModel's variables.

    Same order contract as models.yolov4.load_darknet_weights
    ([bn_bias, bn_scale, mean, var, kernel] per BN conv; [bias, kernel]
    per linear conv, in cfg order); the executor creates modules in cfg
    order, so the flattened param dict's insertion order IS the darknet
    layer order. BN modules pair with their conv positionally: the k-th
    bias-less conv owns BatchNorm_k."""
    import flax

    buf = np.fromfile(path, dtype=np.float32, offset=20)
    flat = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"])
    pos = 0

    def take(n, shape):
        nonlocal pos
        if pos + n > len(buf):
            raise ValueError(
                f"darknet weights file too short: need {pos + n} floats, "
                f"have {len(buf)}"
            )
        out = buf[pos : pos + n].reshape(shape)
        pos += n
        return out

    conv_paths = [p[:-1] for p in flat if p[-1] == "kernel"]  # cfg order
    bn_i = 0
    for cp in conv_paths:
        kernel = flat[cp + ("kernel",)]
        kh, kw, cin, cout = kernel.shape
        bias_path = cp + ("bias",)
        if bias_path in flat:
            flat[bias_path] = take(cout, (cout,))
        else:
            bnp = cp[:-1] + (f"BatchNorm_{bn_i}",)
            bn_i += 1
            assert bnp + ("bias",) in flat, f"no {bnp} for {cp}"
            flat[bnp + ("bias",)] = take(cout, (cout,))
            flat[bnp + ("scale",)] = take(cout, (cout,))
            stats[bnp + ("mean",)] = take(cout, (cout,))
            stats[bnp + ("var",)] = take(cout, (cout,))
        w = take(kh * kw * cin * cout, (cout, cin, kh, kw))
        flat[cp + ("kernel",)] = np.transpose(w, (2, 3, 1, 0))

    if pos != len(buf):
        raise ValueError(
            f"darknet weights file has {len(buf) - pos} trailing floats "
            f"(expected exactly {pos})"
        )
    return {
        "params": flax.traverse_util.unflatten_dict(flat),
        "batch_stats": flax.traverse_util.unflatten_dict(stats),
    }
