"""Jittable linear assignment (Hungarian matching) for TPU.

The reference does Hungarian matching on CPU via
``scipy.optimize.linear_sum_assignment`` inside the train step
(``opera/core/bbox/assigners/hungarian_assigner.py:132-140``), forcing a
host<->device sync per image per decoder layer per iteration.  Here the
shortest-augmenting-path algorithm (the same one scipy implements) is
expressed with ``lax`` control flow over a statically padded cost matrix, so
matching stays on device inside the jitted train step and vmaps over the
batch.

Shapes are static: ``cost`` is ``(R, C)`` with ``R <= C``; invalid (padded)
rows must carry a constant cost (each padded row adds the same constant
whatever column it receives, so the optimum over the real rows is
unaffected).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


@functools.partial(jax.jit, static_argnames=())
def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment; returns ``col4row`` of shape ``(R,)``.

    Args:
        cost: ``(R, C)`` float cost matrix, ``R <= C``. All entries finite.

    Returns:
        ``col4row``: int32 ``(R,)``, the column assigned to each row.
    """
    cost = cost.astype(jnp.float32)
    R, C = cost.shape
    assert R <= C, f"need R <= C, got {cost.shape}"

    u0 = jnp.zeros((R,), jnp.float32)
    v0 = jnp.zeros((C,), jnp.float32)
    col4row0 = jnp.full((R,), -1, jnp.int32)
    row4col0 = jnp.full((C,), -1, jnp.int32)

    def assign_row(cur_row, state):
        u, v, col4row, row4col = state

        spc0 = jnp.full((C,), _INF)           # shortest path costs
        path0 = jnp.full((C,), -1, jnp.int32)
        sr0 = jnp.zeros((R,), bool)           # scanned rows
        sc0 = jnp.zeros((C,), bool)           # scanned cols

        def dijkstra_cond(carry):
            sink, *_ = carry
            return sink < 0

        def dijkstra_body(carry):
            sink, i, min_val, spc, path, sr, sc = carry
            sr = sr.at[i].set(True)
            # relax all unscanned columns from row i
            r = min_val + cost[i] - u[i] - v
            better = (r < spc) & (~sc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)
            # pick the unscanned column with the smallest path cost,
            # preferring an unassigned column on ties (matches scipy).
            masked = jnp.where(sc, _INF, spc)
            lowest = jnp.min(masked)
            tie = masked <= lowest
            unassigned_tie = tie & (row4col < 0)
            j = jnp.where(
                jnp.any(unassigned_tie),
                jnp.argmax(unassigned_tie),
                jnp.argmax(tie)).astype(jnp.int32)
            min_val = lowest
            sc = sc.at[j].set(True)
            hit_free = row4col[j] < 0
            sink = jnp.where(hit_free, j, jnp.int32(-1))
            i = jnp.where(hit_free, i, row4col[j])
            return sink, i, min_val, spc, path, sr, sc

        sink, _, min_val, spc, path, sr, sc = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body,
            (jnp.int32(-1), cur_row, jnp.float32(0.0),
             spc0, path0, sr0, sc0))

        # dual updates
        u = u.at[cur_row].add(min_val)
        other = sr & (jnp.arange(R) != cur_row)
        safe_cols = jnp.where(col4row >= 0, col4row, 0)
        u = u + jnp.where(other, min_val - spc[safe_cols], 0.0)
        v = v + jnp.where(sc, spc - min_val, 0.0)

        # augment along the alternating path back to cur_row
        def aug_cond(carry):
            done, *_ = carry
            return ~done

        def aug_body(carry):
            done, j, col4row, row4col = carry
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev_j = col4row[i]
            col4row = col4row.at[i].set(j)
            done = i == cur_row
            return done, prev_j, col4row, row4col

        _, _, col4row, row4col = jax.lax.while_loop(
            aug_cond, aug_body, (jnp.bool_(False), sink, col4row, row4col))
        return u, v, col4row, row4col

    _, _, col4row, _ = jax.lax.fori_loop(
        0, R, assign_row, (u0, v0, col4row0, row4col0))
    return col4row


def hungarian_masked(cost: jnp.ndarray, row_valid: jnp.ndarray,
                     pad_cost: float = 1e4):
    """Assignment with padded rows; invalid rows get ``col4row = -1``.

    ``row_valid`` is a bool ``(R,)`` mask. Padded rows are replaced with a
    constant cost row so they soak up leftover columns without disturbing
    the optimum of the valid rows.
    """
    R, C = cost.shape
    cost = jnp.where(row_valid[:, None], cost, pad_cost)
    col4row = hungarian(cost)
    return jnp.where(row_valid, col4row, -1)
