"""Connected-components labeling as a Pallas TPU kernel.

The XLA formulation (cova_tpu.ops.cc) re-materializes the label grid in
HBM between sweeps and uses per-pixel gathers for pointer jumping. This
kernel keeps one frame's label grid resident in VMEM for all sweeps and
uses only VPU work (`pltpu.roll` shifts + selects — no gathers, no HBM
round trips):

* each sweep runs four segmented min-scans (Hillis-Steele doubling over
  rows then columns, segments = connected runs) plus one 8-neighborhood
  hop for the diagonal links;
* a scan collapses an entire horizontal/vertical run at once, so a
  sweep advances labels across a whole arm of any shape (purely diagonal
  chains advance one hop per sweep);
* sweeps iterate to convergence per frame (`while_loop` inside the
  kernel — no cross-batch synchronization), with `num_sweeps` as a hard
  safety bound.

Labels are the linear index of the component's root (raster-first
pixel), background = H*W, matching the XLA op bit-for-bit on
convergence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cc_kernel(mask_ref, lab_ref, *, h, w, num_sweeps):
    big = jnp.int32(h * w)
    mask = mask_ref[0] != 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lab0 = jnp.where(mask, rows * w + cols, big)

    def shift_from(x, axis, dist, fill):
        """Value of the pixel `dist` earlier along `axis` scan direction
        (+dist = take from smaller index, -dist = from larger)."""
        size = h if axis == 0 else w
        idx = rows if axis == 0 else cols
        amt = dist if dist > 0 else size + dist
        y = pltpu.roll(x, amt, axis)
        if dist > 0:
            return jnp.where(idx < dist, fill, y)
        return jnp.where(idx >= size + dist, fill, y)

    mask_i = mask.astype(jnp.int32)  # Mosaic rotate needs 32-bit lanes

    def seg_scan(lab, axis, direction):
        """Min within the connected run, scanning along `axis`;
        direction +1 = from lower indices, -1 = from higher."""
        size = h if axis == 0 else w
        prev_fg = shift_from(mask_i, axis, direction, jnp.int32(0))
        # segment start (no link to the previous pixel); kept as i32 so
        # the doubling shifts stay 32-bit for the rotate op.
        flag = 1 - mask_i * prev_fg
        v = lab
        s = 1
        while s < size:
            vj = shift_from(v, axis, direction * s, big)
            fj = shift_from(flag, axis, direction * s, jnp.int32(1))
            v = jnp.where(flag > 0, v, jnp.minimum(v, vj))
            flag = jnp.maximum(flag, fj)
            s <<= 1
        return jnp.where(mask, v, big)

    def hop(lab):
        m = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                y = lab
                if dy != 0:
                    y = shift_from(y, 0, dy, big)
                if dx != 0:
                    y = shift_from(y, 1, dx, big)
                m = jnp.minimum(m, y)
        return jnp.where(mask, m, big)

    def sweep(lab):
        lab = hop(lab)
        lab = seg_scan(lab, 1, 1)
        lab = seg_scan(lab, 1, -1)
        lab = seg_scan(lab, 0, 1)
        lab = seg_scan(lab, 0, -1)
        return lab

    # Iterate to per-frame convergence: each grid program exits as soon
    # as ITS frame is stable (no cross-batch synchronization), with
    # `num_sweeps` as a hard safety bound.
    def cond(carry):
        _, changed, it = carry
        return jnp.logical_and(changed, it < num_sweeps)

    def body(carry):
        lab, _, it = carry
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (sweep(lab0), jnp.bool_(True), jnp.int32(0))
    )
    lab_ref[0] = lab


@functools.partial(jax.jit, static_argnames=("num_sweeps", "interpret"))
def connected_components_pallas(
    masks: jnp.ndarray, num_sweeps: int = 256, interpret: bool = False
) -> jnp.ndarray:
    """Label a (B, H, W) boolean mask batch; returns (B, H, W) int32."""
    b, h, w = masks.shape
    return pl.pallas_call(
        functools.partial(_cc_kernel, h=h, w=w, num_sweeps=num_sweeps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        interpret=interpret,
    )(masks.astype(jnp.int32))
