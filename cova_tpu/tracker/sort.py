"""SORT multi-object tracking as a batched, jit-friendly state machine.

The reference tracks with a Vec of per-track Kalman structs updated one
frame at a time (reference: cova-rs/sort/src/lib.rs).  Here track slots
are fixed-capacity arrays so the per-frame step jits once and runs inside
`lax.scan` over time, vmapped/sharded over independent streams.

Lifecycle parity notes (all mirroring cova-rs/sort):
 * cost = weight - IoU with weight 1 for active, 2 for inactive tracks;
   the square assignment matrix is zero-padded (lib.rs:25-56);
 * pairs with cost == 2.0 (inactive, IoU 0) are discarded; accepted pairs
   need cost <= weight - iou_threshold, i.e. IoU >= iou_threshold
   (lib.rs:106-127);
 * `time_since_update`/`last_match` only reset/advance once a track's
   hit streak reaches 5 (tracker/mod.rs:76-80);
 * activation when hit_streaks >= min_hits (mod.rs:128-132); death when
   time_since_update > max_age (mod.rs:123-126); dead tracks are
   reported only if active, with the last `time_since_update` history
   entries trimmed by the consumer (mod.rs:138-151, lib.rs:169-177);
 * births claim slots freed by deaths in the same frame, in detection
   order (lib.rs:183-188).

`seen_ts` bookkeeping lives host-side (see cova_tpu.scheduler) because it
is fed back from decode scheduling decisions.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from cova_tpu.config import SortConfig
from cova_tpu.ops.assignment import solve_assignment_overflow
from cova_tpu.ops.iou import iou_matrix
from cova_tpu.tracker import kalman
from cova_tpu.types import Boxes

HIT_STREAK_CONFIRM = 5  # reference's hard-coded streak gate (mod.rs:76-80)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(aux: Any, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register
@dataclasses.dataclass
class SortState:
    mean: jax.Array  # (MT, 7)
    cov: jax.Array  # (MT, 7, 7)
    exists: jax.Array  # (MT,) bool
    active: jax.Array  # (MT,) bool
    track_id: jax.Array  # (MT,) int32
    start_ts: jax.Array  # (MT,) int32 frame index
    last_match: jax.Array  # (MT,) int32
    hits: jax.Array  # (MT,) int32
    hit_streak: jax.Array  # (MT,) int32
    time_since_update: jax.Array  # (MT,) int32
    age: jax.Array  # (MT,) int32
    id_counter: jax.Array  # () int32
    frame_count: jax.Array  # () int32


@_register
@dataclasses.dataclass
class SortOutputs:
    """Per-frame emissions, all fixed-shape. The host rebuilds per-track
    histories and the aggregator payloads from these."""

    track_ltwh: jax.Array  # (MT, 4) predicted boxes this frame
    track_id: jax.Array  # (MT,) int32 — pre-birth ids (history attribution)
    track_id_post: jax.Array  # (MT,) int32 — post-birth ids (live set)
    exists: jax.Array  # (MT,) bool (post step: births included, deaths removed)
    active: jax.Array  # (MT,) bool
    predicted: jax.Array  # (MT,) bool — slot predicted this frame (history entry)
    matched_det: jax.Array  # (MT,) int32 det index or -1
    det_track_id: jax.Array  # (MD,) int32 track id per detection or -1
    death: jax.Array  # (MT,) bool — slot died this frame
    death_id: jax.Array  # (MT,) int32
    death_start: jax.Array  # (MT,) int32
    death_last_match: jax.Array  # (MT,) int32
    death_tsu: jax.Array  # (MT,) int32 (history trim amount)
    death_active: jax.Array  # (MT,) bool (only active deaths are reported)


def sort_init(max_tracks: int) -> SortState:
    mt = max_tracks
    return SortState(
        mean=jnp.zeros((mt, 7), jnp.float32),
        cov=jnp.broadcast_to(jnp.eye(7, dtype=jnp.float32), (mt, 7, 7)),
        exists=jnp.zeros((mt,), bool),
        active=jnp.zeros((mt,), bool),
        track_id=jnp.full((mt,), -1, jnp.int32),
        start_ts=jnp.zeros((mt,), jnp.int32),
        last_match=jnp.zeros((mt,), jnp.int32),
        hits=jnp.zeros((mt,), jnp.int32),
        hit_streak=jnp.zeros((mt,), jnp.int32),
        time_since_update=jnp.zeros((mt,), jnp.int32),
        age=jnp.zeros((mt,), jnp.int32),
        id_counter=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def sort_step(
    state: SortState, dets: Boxes, ts: jnp.ndarray, cfg: SortConfig
) -> tuple[SortState, SortOutputs]:
    """One SORT frame update (reference: Sort::update, lib.rs:131-196)."""
    mt = state.mean.shape[0]
    md = dets.valid.shape[0]

    frame_count = state.frame_count + 1

    # ---- predict all existing tracks -------------------------------------
    mean_p, cov_p = kalman.kalman_predict(state.mean, state.cov)
    mean_p = jnp.where(state.exists[:, None], mean_p, state.mean)
    cov_p = jnp.where(state.exists[:, None, None], cov_p, state.cov)
    pred_ltwh = kalman.x_to_bbox(mean_p, cfg.reproduce_from_x_quirk)
    predicted = state.exists
    age = state.age + predicted
    tsu = state.time_since_update + predicted

    # ---- assignment -------------------------------------------------------
    # Emulate the reference's zero-padded square Hungarian exactly: with
    # n_t live tracks and n_d valid detections the reference solves a
    # max(n_t, n_d)-square matrix where only the surplus rows/columns
    # are zero padding — live tracks can NOT escape to padding while
    # real detections remain.  That square LAP reduces exactly to the
    # rectangular live-rows x valid-columns problem with an
    # unlimited-capacity overflow at cost 3.0 (just above the real
    # range [0, 2], so real columns are always preferred): dead-slot
    # rows cost 0 everywhere (any completion optimal) and the padding
    # columns are interchangeable — see solve_assignment_overflow.
    iou = iou_matrix(pred_ltwh, dets.ltwh)  # (MT, MD)
    weight = jnp.where(state.active, 1.0, 2.0)  # (MT,)
    cost = weight[:, None] - iou
    assigned_col = solve_assignment_overflow(
        cost, state.exists, dets.valid, 3.0
    )  # (MT,) column or -1
    pair_ok = (
        state.exists
        & (assigned_col >= 0)
        & (assigned_col < md)
        & jnp.take(dets.valid, jnp.clip(assigned_col, 0, md - 1))
    )
    pair_iou = jnp.take_along_axis(
        iou, jnp.clip(assigned_col, 0, md - 1)[:, None], axis=1
    )[:, 0]
    # Discard cost==2.0 (inactive & IoU 0) and apply the acceptance
    # threshold; both reduce to IoU >= iou_threshold (and IoU > 0).
    accept = pair_ok & (pair_iou >= cfg.iou_threshold) & (pair_iou > 0.0)
    matched_det = jnp.where(accept, assigned_col, -1)  # (MT,)

    det_matched = jnp.zeros((md,), bool)
    det_matched = det_matched.at[
        jnp.where(accept, assigned_col, md)
    ].set(True, mode="drop")
    det_track_id = jnp.full((md,), -1, jnp.int32)
    det_track_id = det_track_id.at[jnp.where(accept, assigned_col, md)].set(
        state.track_id, mode="drop"
    )

    # ---- measurement update ----------------------------------------------
    z_det = kalman.bbox_to_z(dets.ltwh)  # (MD, 4)
    z = jnp.take(z_det, jnp.maximum(matched_det, 0), axis=0)  # (MT, 4)
    mean_u, cov_u = kalman.kalman_update(mean_p, cov_p, z)
    matched = matched_det >= 0
    mean_n = jnp.where(matched[:, None], mean_u, mean_p)
    cov_n = jnp.where(matched[:, None, None], cov_u, cov_p)

    hits = state.hits + matched
    hit_streak = jnp.where(matched, state.hit_streak + 1, 0)
    confirm = matched & (hit_streak >= HIT_STREAK_CONFIRM)
    tsu = jnp.where(confirm, 0, tsu)
    last_match = jnp.where(confirm, ts, state.last_match)

    # ---- activation -------------------------------------------------------
    active = state.active | (state.exists & (hit_streak >= cfg.min_hits))

    # ---- deaths -----------------------------------------------------------
    death = state.exists & (tsu > cfg.max_age)
    exists = state.exists & ~death
    # Snapshot death info before births can reuse the freed slots.
    death_last_match = last_match
    death_tsu = tsu
    death_active = active

    # ---- births -----------------------------------------------------------
    det_unmatched = dets.valid & ~det_matched
    # k-th free slot gets the k-th unmatched detection.
    free_rank = jnp.cumsum(~exists) - 1  # rank among free slots
    det_rank = jnp.cumsum(det_unmatched) - 1
    # For each detection, the slot index with matching free rank:
    slot_of_rank = jax.lax.top_k(
        -jnp.where(~exists, jnp.arange(mt), mt), mt
    )[1]  # free slots in ascending index order
    birth_slot = jnp.take(
        slot_of_rank, jnp.minimum(det_rank, mt - 1)
    )  # (MD,)
    n_free = jnp.sum(~exists)
    birth_ok = det_unmatched & (det_rank < n_free)

    # New track ids follow detection order (reference pushes in order).
    new_id = state.id_counter + jnp.where(birth_ok, det_rank, 0)
    id_counter = state.id_counter + jnp.sum(birth_ok)

    z_birth = z_det  # (MD, 4)
    b_mean, b_cov = kalman.kalman_init(z_birth)

    scatter_idx = jnp.where(birth_ok, birth_slot, mt)
    exists = exists.at[scatter_idx].set(True, mode="drop")
    active2 = active.at[scatter_idx].set(False, mode="drop")
    mean_n = mean_n.at[scatter_idx].set(b_mean, mode="drop")
    cov_n = cov_n.at[scatter_idx].set(b_cov, mode="drop")
    track_id = state.track_id.at[scatter_idx].set(new_id.astype(jnp.int32), mode="drop")
    start_ts = state.start_ts.at[scatter_idx].set(ts, mode="drop")
    last_match = last_match.at[scatter_idx].set(ts, mode="drop")
    hits = hits.at[scatter_idx].set(0, mode="drop")
    hit_streak = hit_streak.at[scatter_idx].set(0, mode="drop")
    tsu2 = tsu.at[scatter_idx].set(0, mode="drop")
    age2 = age.at[scatter_idx].set(0, mode="drop")

    new_state = SortState(
        mean=mean_n,
        cov=cov_n,
        exists=exists,
        active=active2,
        track_id=track_id,
        start_ts=start_ts,
        last_match=last_match,
        hits=hits,
        hit_streak=hit_streak,
        time_since_update=tsu2,
        age=age2,
        id_counter=id_counter,
        frame_count=frame_count,
    )
    outputs = SortOutputs(
        track_ltwh=pred_ltwh,
        track_id=state.track_id,
        track_id_post=track_id,
        exists=exists,
        active=active2,
        predicted=predicted,
        matched_det=matched_det,
        det_track_id=det_track_id,
        death=death,
        death_id=state.track_id,
        death_start=state.start_ts,
        death_last_match=death_last_match,
        death_tsu=death_tsu,
        death_active=death_active,
    )
    return new_state, outputs
