"""Linear assignment as a jit-friendly device op.

The reference solves min-cost assignment with a Hungarian solver on a
square matrix zero-padded from the (trackers x detections) cost matrix
(reference: cova-rs/sort/src/lib.rs:25-56 `linear_assignment`).  On TPU we
use the auction algorithm (Bertsekas) with epsilon scaling — fully
vectorizable (every unassigned row bids in parallel each round, column
winners resolved with an argmax) and optimal once eps < gap/S.

Auction iteration counts scale with (cost range) / eps, so callers must
keep costs in a small range (SORT uses [0, 3]: real costs in [0, 2],
forced-overflow padding at 3 — never use huge sentinel costs here).

All shapes are static: pass an (S, S) cost matrix (pad yourself, the
padding convention is the caller's contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e9


def _auction_phase(profit, row_to_col, col_to_row, prices, eps, max_iters):
    s = profit.shape[0]

    def cond(state):
        row_to_col, _, _, it = state
        return jnp.logical_and(jnp.any(row_to_col < 0), it < max_iters)

    def body(state):
        row_to_col, col_to_row, prices, it = state
        unassigned = row_to_col < 0  # (S,)

        # Every unassigned row bids for its best column.
        value = profit - prices[None, :]  # (S, S)
        best_j = jnp.argmax(value, axis=1)  # (S,)
        best_v = jnp.max(value, axis=1)
        masked = value.at[jnp.arange(s), best_j].set(_NEG)
        second_v = jnp.max(masked, axis=1)
        bid = prices[best_j] + (best_v - second_v) + eps  # (S,)

        # Resolve per-column winner: highest bid wins.
        bid_matrix = jnp.where(
            unassigned[:, None]
            & (jax.lax.broadcasted_iota(jnp.int32, (s, s), 1) == best_j[:, None]),
            bid[:, None],
            _NEG,
        )
        col_best_bid = jnp.max(bid_matrix, axis=0)  # (S,)
        col_winner = jnp.argmax(bid_matrix, axis=0)
        has_bid = col_best_bid > _NEG / 2

        # Previous owners of re-bid columns lose them (bidders are all
        # unassigned, so winners and owners are disjoint).
        prev_owner = col_to_row
        lost = (
            jnp.zeros((s,), bool)
            .at[jnp.where(has_bid & (prev_owner >= 0), prev_owner, s)]
            .set(True, mode="drop")
        )
        row_to_col = jnp.where(lost, -1, row_to_col)
        row_to_col = row_to_col.at[jnp.where(has_bid, col_winner, s)].set(
            jnp.arange(s, dtype=jnp.int32), mode="drop"
        )
        col_to_row = jnp.where(has_bid, col_winner, col_to_row).astype(jnp.int32)
        prices = jnp.where(has_bid, col_best_bid, prices)
        return row_to_col, col_to_row, prices, it + 1

    return jax.lax.while_loop(
        cond, body, (row_to_col, col_to_row, prices, jnp.zeros((), jnp.int32))
    )


@functools.partial(jax.jit, static_argnames=("max_iters", "phases"))
def solve_assignment(
    cost: jnp.ndarray,
    eps: float = 1e-2,
    max_iters: int = 512,
    phases: int = 1,
) -> jnp.ndarray:
    """Solve the square min-cost assignment problem.

    Default is a single auction phase at the target eps: under vmap a
    while_loop runs until EVERY lane converges, and the multi-phase eps
    ladder made lanes converge at staggered rates — measured 55x slower
    than one phase inside the vmapped SORT scan (40.5 vs 0.73 ms/solve
    on a v5e via axon). The result is optimal whenever cost gaps exceed
    S*eps; the default eps=1e-2 trades sub-0.16-IoU tie-breaking
    fidelity for a 4.4x faster SORT scan on real video (9.6 -> 2.2 s
    per 1024-window chunk) — the exact-optimal production tracker is
    the host-side min-cost flow (csrc/cctrack.cc); this op serves the
    all-device multi-chip program and still passes every ported
    reference Hungarian case. Pass eps=1e-4 for near-exact optima. Any
    rows still unassigned at max_iters (tie-group churn) are completed
    by rank-matching free rows to free columns — for SORT those rows
    are dead/padding slots whose pairing is immaterial.

    Returns row_to_col: (S,) int32 — a complete permutation, like the
    reference's square Hungarian.
    """
    s = cost.shape[0]
    assert cost.shape == (s, s), "solve_assignment expects a square matrix"
    profit = -cost.astype(jnp.float32)

    cost_range = jnp.maximum(jnp.max(profit) - jnp.min(profit), 1.0)
    row_to_col = jnp.full((s,), -1, jnp.int32)
    col_to_row = jnp.full((s,), -1, jnp.int32)
    prices = jnp.zeros((s,), jnp.float32)

    if phases > 1:
        # eps ladder: range/4 -> ... -> eps
        for p in range(phases - 1):
            frac = (p + 1) / phases
            cur_eps = cost_range / 4.0 * (4.0 * eps / cost_range) ** frac
            row_to_col, col_to_row, prices, _ = _auction_phase(
                profit,
                jnp.full((s,), -1, jnp.int32),
                jnp.full((s,), -1, jnp.int32),
                prices,
                cur_eps,
                max_iters,
            )
    row_to_col, col_to_row, prices, _ = _auction_phase(
        profit,
        jnp.full((s,), -1, jnp.int32),
        jnp.full((s,), -1, jnp.int32),
        prices,
        eps,
        max_iters * 2,
    )
    # Greedy completion: rank-match any still-unassigned rows to the
    # free columns (ascending index), guaranteeing a full permutation.
    unassigned = row_to_col < 0
    owned = (
        jnp.zeros((s,), bool)
        .at[jnp.where(~unassigned, row_to_col, s)]
        .set(True, mode="drop")
    )
    row_rank = jnp.cumsum(unassigned) - 1
    free_cols = jax.lax.top_k(-jnp.where(~owned, jnp.arange(s), s), s)[1]
    fill = jnp.take(free_cols, jnp.clip(row_rank, 0, s - 1))
    return jnp.where(unassigned, fill, row_to_col)
