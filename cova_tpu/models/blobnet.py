"""BlobNet — the compressed-domain foreground segmentation CNN, in Flax.

Architecture parity with the reference Keras model (reference:
utils/model/{blobnet,encoder,decoder,pointwise}.py and training config
utils/train-blobnet.py:57-69):

* encoder: 4 stages; each = Conv3D(kernel (1,3,3), channels
  [16, 32, 64, 128]) + BatchNorm + MaxPool(1,2,2) with asymmetric
  zero-padding when the pooled dim was odd (pad *before*, i.e. top/left)
  + a residual point-wise temporal block (two Conv1D(4, 1, relu, no
  bias) across the T axis, residual add, relu);
* decoder: operates on the first temporal slice of each encoder output
  (reversed), 4 ConvTranspose(kernel (4,4), stride 2, VALID) upsample
  blocks (channels [64, 32, 16, 16]) each preceded by relu+dropout and
  followed by center crop/pad to the skip shape, BatchNorm and skip
  concat (except the last), final 1x1 conv + sigmoid.

TPU-first re-design notes: the reference's Conv3D kernels are (1,3,3) —
temporally degenerate — so the encoder here folds T into the batch axis
and runs plain NHWC Conv2D (MXU-friendly, no transposes); the only
temporal mixing, the point-wise block, becomes an einsum over a (T,T)
matrix. Layout is NHWC throughout (the reference is NCTHW, channels
first, which would force relayouts on TPU). Compute dtype bfloat16 with
float32 params/statistics is supported via the `dtype` argument.

Input: (B, T=4, H=45, W=80, C) normalized macroblock metadata.
The SHIPPED contract (artifacts/blobnet_demo*.npz, since round 3) is
C=4: [mb_class, signed mv_x, signed mv_y, residual-nnz], signed MVs
offset-128 u8 on the wire and normalized clip(x-128,-6,6)/6 — the
reference's signed-MV contract (utils/data/parse.py:5-31) plus a
residual-density channel the reference's byte layout reserves but
never fills (measured ablation: ACCURACY.md "Input channels" table —
+0.02 BP / −0.02 GC over |mv| variants). Legacy C=3 unsigned-|mv|
weights (clip(x,0,6)/6) remain loadable; the artifact's stored
metadata (`use_nnz_channel`, `signed_mv`) selects the wire format, see
models.load_artifact and cova_tpu.ops.preprocess.
Output: (B, H, W) foreground probability mask.

Reference-trained Keras weights (unobtainable offline anyway) are NOT
drop-in — weights are trained against this framework's own decoder
output, as examples/train_blobnet.py does.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BlobNetConfig:
    encoder_channels: Sequence[int] = (16, 32, 64, 128)
    decoder_channels: Sequence[int] = (64, 32, 16, 16)
    temporal_layers: int = 2  # Conv1D(4,1) count in the point-wise block
    timestep: int = 4
    dropout: float = 0.2
    # 3 = [mb_class, mv_x, mv_y] (legacy unsigned-|mv| weights); 4 adds
    # the residual nnz density channel — the shipped artifacts use 4
    # with signed MVs (CompressedStageConfig.{use_nnz_channel,signed_mv}).
    in_channels: int = 3


class PointWiseTemporal(nn.Module):
    """Residual temporal-mixing block (reference: utils/model/pointwise.py).

    x: (B, T, H, W, C). Each inner layer is a TxT dense mix over the
    temporal axis (the reference's Conv1D(filters=T, kernel 1, no bias)
    with the T axis as channels), relu and dropout, then residual + relu.
    """

    layers: int
    timestep: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = x
        for i in range(self.layers):
            w = self.param(
                f"mix_{i}",
                nn.initializers.lecun_normal(),
                (self.timestep, self.timestep),
                jnp.float32,
            )
            h = jnp.einsum("bthwc,ts->bshwc", h, w.astype(self.dtype))
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.relu(h + x)


def _pool_pad(x):
    """MaxPool (2,2) over H,W then zero-pad top/left when the unpooled dim
    was odd (reference: encoder.py:63-71 pads (1,0) after pooling)."""
    b, t, h, w, c = x.shape
    y = nn.max_pool(
        x.reshape(b * t, h, w, c), window_shape=(2, 2), strides=(2, 2)
    )
    ph = 1 if h % 2 else 0
    pw = 1 if w % 2 else 0
    if ph or pw:
        y = jnp.pad(y, ((0, 0), (ph, 0), (pw, 0), (0, 0)))
    hh, ww = y.shape[1], y.shape[2]
    return y.reshape(b, t, hh, ww, c)


def _crop_or_pad_center(x, th, tw):
    """Center crop/pad H,W to target, extra element goes first
    (reference: decoder.py:44-72 uses (d//2 + d%2, d//2))."""
    h, w = x.shape[-3], x.shape[-2]
    dh, dw = h - th, w - tw
    if dh > 0:
        x = x[..., dh // 2 + dh % 2 : h - dh // 2, :, :]
    elif dh < 0:
        d = -dh
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 3) + [(d // 2 + d % 2, d // 2), (0, 0), (0, 0)],
        )
    if dw > 0:
        x = x[..., :, dw // 2 + dw % 2 : w - dw // 2, :]
    elif dw < 0:
        d = -dw
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 2) + [(d // 2 + d % 2, d // 2), (0, 0)],
        )
    return x


class BlobNet(nn.Module):
    config: BlobNetConfig = BlobNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.config
        x = x.astype(self.dtype)
        b, t, h0, w0, _ = x.shape

        # ---- encoder ----
        skips = []
        for ch in cfg.encoder_channels:
            bb, tt, hh, ww, cc = x.shape
            y = x.reshape(bb * tt, hh, ww, cc)
            # (1,3,3) Conv3D == per-timestep 3x3 Conv2D
            y = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(y)
            y = nn.relu(y)
            y = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, axis_name=None
            )(y)
            x = y.reshape(bb, tt, hh, ww, ch)
            x = _pool_pad(x)
            x = PointWiseTemporal(
                cfg.temporal_layers, cfg.timestep, cfg.dropout, self.dtype
            )(x, train=train)
            skips.append(x)

        # ---- decoder: first temporal slice of reversed skips ----
        feats = [s[:, 0] for s in reversed(skips)]  # (B, H, W, C) each
        targets = [f.shape[1:3] for f in feats[1:]] + [(h0, w0)]

        x = feats[0]
        for i, ch in enumerate(cfg.decoder_channels):
            x = nn.relu(x)
            x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
            x = nn.ConvTranspose(
                ch, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype
            )(x)
            th, tw = targets[i]
            x = _crop_or_pad_center(x, th, tw)
            if i < len(cfg.decoder_channels) - 1:
                x = nn.BatchNorm(
                    use_running_average=not train, dtype=self.dtype
                )(x)
                x = jnp.concatenate([x, feats[i + 1]], axis=-1)

        x = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))[..., 0]  # (B, H, W)


def create_blobnet(rng, config: BlobNetConfig = BlobNetConfig(), dtype=jnp.float32):
    """Init helper returning (model, variables)."""
    model = BlobNet(config, dtype)
    dummy = jnp.zeros((1, config.timestep, 45, 80, config.in_channels), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables


def save_params_npz(path, variables, meta: dict | None = None) -> None:
    """Persist a variables pytree as one flat .npz file — a
    single-artifact alternative to an orbax checkpoint directory
    (committed model weights live in artifacts/*.npz). `meta` stores a
    JSON dict describing the input contract the weights were trained
    for (in_channels, signed_mv, ...) under the "__meta__" key; readers
    use `load_meta_npz`."""
    import json as _json

    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrays = {}
    for path_parts, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path_parts
        )
        arrays[key] = np.asarray(leaf)
    if meta:
        arrays["__meta__"] = np.frombuffer(
            _json.dumps(meta).encode(), dtype=np.uint8
        )
    import pathlib

    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_meta_npz(path) -> dict:
    """Input-contract metadata stored by save_params_npz ({} if none)."""
    import json as _json

    import numpy as np

    with np.load(path) as data:
        if "__meta__" not in data:
            return {}
        return _json.loads(bytes(data["__meta__"]).decode())


def load_artifact(path, rng=None, dtype=jnp.float32):
    """Build (model, variables, meta) from a self-describing npz weight
    artifact: the architecture comes from the stored input-contract
    metadata (in_channels; signed_mv tells the caller which metadata
    packing/normalization the weights expect)."""
    meta = load_meta_npz(path)
    cfg = BlobNetConfig(in_channels=int(meta.get("in_channels", 3)))
    model, template = create_blobnet(
        rng if rng is not None else jax.random.PRNGKey(0), cfg, dtype
    )
    return model, load_params_npz(path, template), meta


def load_params_npz(path, template):
    """Restore a variables pytree saved by save_params_npz; `template` is
    a same-structured pytree (e.g. from create_blobnet)."""
    import numpy as np

    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path_parts, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path_parts
        )
        arr = data[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}"
            )
        leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
