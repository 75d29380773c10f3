"""Jittable bipartite matching for set-prediction losses (Mask2Former).

The reference's Mask2Former training assigns ground-truth masks to
decoder queries with a Hungarian matcher (ref seg/configs/_base_/models/
mask2former_onepeace.py:110-118 MaskHungarianAssigner; the torch stack
calls scipy.optimize.linear_sum_assignment on a host-side cost matrix
per image).  A host callback per train step does not belong in a pjit
program — on TPU it would serialize every step on a device->host->device
round trip — so this module implements the assignment as a fixed-shape
**auction algorithm** (Bertsekas 1988) in pure lax ops.

Key correctness detail: the eps-scaling auction (prices persist across
eps rounds, assignments restart) is only guaranteed near-optimal for the
SQUARE assignment problem — run naively on a K x N rectangle it can
terminate eps-CS-feasible yet far from optimal, because stale high
prices on good columns are never bid back down once fewer bidders
remain.  We therefore pad the benefit matrix with constant-benefit dummy
rows to N x N (a column-independent dummy row shifts every square
assignment's total by the same constant, so the real rows' optimal
columns are unchanged) and read back the first K rows.  The final
assignment is within N * eps_final of optimal; eps_final is driven to
1e-5 of the benefit spread, orders below the noise floor of a
stochastic training loss (exactness vs scipy is asserted in
tests/test_mask2former.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def auction_assign(cost: jnp.ndarray, row_valid: jnp.ndarray,
                   scaling_steps: int = 10) -> jnp.ndarray:
    """Minimize ``sum cost[i, col[i]]`` over distinct columns.

    cost: (K, N) float matrix, K <= N; row_valid: (K,) bool (padded GT
    rows still get a column — mask them out of the loss downstream).
    Returns col (K,) int32, an injective assignment.
    """
    k, n = cost.shape
    assert k <= n, (k, n)
    benefit = -cost.astype(jnp.float32)
    # padded/dummy rows: flat benefit (they soak up the leftover columns
    # without influencing which columns the real rows win)
    benefit = jnp.where(row_valid[:, None], benefit, 0.0)
    benefit = jnp.concatenate(
        [benefit, jnp.zeros((n - k, n), jnp.float32)], axis=0)
    m = n  # square size
    spread = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-6)
    eps_final = spread * 1e-5 / (m + 1)

    rows = jnp.arange(m)

    def run_eps(state, eps):
        prices, _ = state
        col = jnp.full((m,), -1, jnp.int32)

        def body(carry):
            prices, col = carry
            unassigned = col < 0
            value = benefit - prices[None, :]  # (m, m)
            best = jnp.argmax(value, axis=1)
            v1 = jnp.max(value, axis=1)
            value2 = value.at[rows, best].set(-jnp.inf)
            v2 = jnp.max(value2, axis=1)
            bid = v1 - v2 + eps  # Bertsekas bid increment
            bid_active = jnp.where(unassigned, bid, -jnp.inf)
            # per-column highest bid this round; ties break to lowest row
            col_bid = jnp.full((m,), -jnp.inf).at[best].max(bid_active)
            winner_mask = (bid_active == col_bid[best]) & unassigned
            row_ids = jnp.where(winner_mask, rows, m).astype(jnp.int32)
            win_row = jnp.full((m,), m, jnp.int32).at[best].min(row_ids)
            is_winner = (win_row[best] == rows) & winner_mask
            prices = prices.at[best].add(jnp.where(is_winner, bid_active, 0.0))
            taken = jnp.full((m,), False).at[best].max(is_winner)
            col = jnp.where(taken[jnp.maximum(col, 0)] & (col >= 0), -1, col)
            col = jnp.where(is_winner, best, col)
            return prices, col

        prices, col = jax.lax.while_loop(
            lambda c: jnp.any(c[1] < 0), body, (prices, col))
        return (prices, col), None

    eps_schedule = jnp.maximum(
        spread / 2.0 * (0.2 ** jnp.arange(scaling_steps)), eps_final)
    (prices, col), _ = jax.lax.scan(
        run_eps, (jnp.zeros((m,), jnp.float32),
                  jnp.full((m,), -1, jnp.int32)), eps_schedule)
    return col[:k]
