"""On-device optimal linear sum assignment (Jonker-Volgenant style).

The reference matcher round-trips the cost matrix to the host and calls
scipy.optimize.linear_sum_assignment per sample inside the train step
(/root/reference/criterion.py:59-80) -- a device->host sync every iteration.
Here the shortest-augmenting-path algorithm (the same family scipy uses) runs
under jit with static shapes, vmapped over the batch: rows = GT boxes (padded
to max_num_obj), columns = proposals.

TPU performance structure (this is the hottest sequential op in the train
step -- it runs for the final + 7 aux decoder layers, 64 problems of 64x128
per step at bs 8):
  * column-reduction greedy initialization (classic LAPJV phase 1,
    parallelized: every row claims its argmin column, lowest row index wins)
    assigns most rows with zero sequential work;
  * padded GT rows (i >= nlive) are skipped outright -- removing a row never
    changes the optimum over the remaining rows, and the caller masks the
    padded rows' outputs anyway;
  * the per-row Dijkstra loop body is scatter-free: the dual update tracks an
    incremental dense `used_rows` mask instead of a scatter-add over matched
    rows (TPU scatters serialize; dense selects ride the VPU).

Produces an optimal assignment (same total cost as scipy); tie-broken
assignments may differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# plain python float, NOT jnp.float32: a module-level jnp op initializes the
# jax backend at IMPORT time, which hangs loader/AP pool workers that import
# this package while unpickling their payload -- before their initializer can
# force the CPU platform (datasets/loader.py _proc_init).  It is traced to a
# f32 constant inside the jitted matcher either way.
_INF = 1e18


def _lsa_single(cost: jnp.ndarray, nlive: jnp.ndarray) -> jnp.ndarray:
    """cost: (R, C) float32 with R <= C; nlive: scalar int, rows >= nlive are
    ignored. Returns col4row: (R,) int32 columns (garbage for dead rows)."""
    r_dim, c_dim = cost.shape
    # static r_dim > c_dim is fine as long as nlive <= c_dim at runtime
    # (dead rows are skipped outright)

    row_ids = jnp.arange(r_dim, dtype=jnp.int32)
    col_ids = jnp.arange(c_dim, dtype=jnp.int32)
    live = row_ids < nlive

    # --- phase 1: column reduction (parallel greedy). Every live row claims
    # its argmin column; the lowest-index claimant wins. Duals stay feasible:
    # u[i] = row minimum, v = 0 => reduced costs >= 0, winners sit at 0.
    u0 = jnp.where(live, jnp.min(cost, axis=1), 0.0).astype(jnp.float32)
    amin = jnp.argmin(cost, axis=1).astype(jnp.int32)  # (R,)
    claim = (amin[:, None] == col_ids[None, :]) & live[:, None]  # (R, C)
    col_any = jnp.any(claim, axis=0)
    col_winner = jnp.argmax(claim, axis=0).astype(jnp.int32)  # first claimant
    p0 = jnp.full((c_dim + 1,), -1, jnp.int32)  # row matched to each column
    p0 = p0.at[:c_dim].set(jnp.where(col_any, col_winner, -1))
    won = live & (jnp.take(col_winner, amin) == row_ids) & jnp.take(col_any, amin)

    v0 = jnp.zeros((c_dim + 1,), jnp.float32)

    # --- phase 2: shortest augmenting path for each remaining live row
    def assign_row(i, state):
        u, v, p = state
        skip = jnp.take(won, i) | (i >= nlive)
        p = p.at[c_dim].set(jnp.where(skip, p[c_dim], i))
        init = (
            u,
            v,
            p,
            jnp.full((c_dim,), _INF),  # minv
            jnp.full((c_dim,), c_dim, jnp.int32),  # way (parent column)
            jnp.zeros((c_dim + 1,), bool),  # used columns
            jnp.zeros((r_dim,), bool),  # used rows (dense dual update)
            jnp.int32(c_dim),  # j0 (virtual column)
            skip,  # done
        )

        def cond(s):
            return ~s[-1]

        def body(s):
            u, v, p, minv, way, used, used_rows, j0, _ = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            used_rows = used_rows | (row_ids == i0)
            cur = jnp.take(cost, i0, axis=0) - jnp.take(u, i0) - v[:c_dim]
            upd = jnp.logical_and(~used[:c_dim], cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used[:c_dim], _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u + jnp.where(used_rows, delta, 0.0)
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used[:c_dim], minv, minv - delta)
            done = p[j1] == -1
            return (u, v, p, minv, way, used, used_rows, j1, done)

        u, v, p, minv, way, used, used_rows, j0, _ = jax.lax.while_loop(
            cond, body, init
        )

        # augment: walk parents back to the virtual column
        def aug_cond(s):
            return s[1] != c_dim

        def aug_body(s):
            p, j0 = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(
            aug_cond, aug_body, (p, jnp.where(skip, jnp.int32(c_dim), j0))
        )
        return (u, v, p)

    _, _, p = jax.lax.fori_loop(0, r_dim, assign_row, (u0, v0, p0))
    row4col = p[:c_dim]
    col4row = jnp.zeros((r_dim,), jnp.int32)
    safe_rows = jnp.where(row4col >= 0, row4col, r_dim)
    col4row = col4row.at[safe_rows].set(col_ids, mode="drop")
    return col4row


@jax.jit
def hungarian_match(cost: jnp.ndarray, nlive: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batched assignment. cost: (B, R, C) -> col4row (B, R) int32.

    Row i of each sample is assigned column col4row[b, i]; all assigned
    columns are distinct; the total cost over rows is minimal.  With `nlive`
    (B,), rows >= nlive[b] are excluded from the problem (their output is
    arbitrary) -- removing rows never changes the optimum over the rest.
    Requires nlive[b] <= C (defaults to R, requiring R <= C).
    """
    cost = cost.astype(jnp.float32)
    if nlive is None:
        assert cost.shape[1] <= cost.shape[2], "need rows <= cols (or pass nlive)"
        nlive = jnp.full((cost.shape[0],), cost.shape[1], jnp.int32)
    return jax.vmap(_lsa_single)(cost, nlive.astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=())
def matcher_assignments(cost_prop_gt: jnp.ndarray, nactual_gt: jnp.ndarray):
    """CoDA matcher postprocessing (reference criterion.py:59-86).

    Args:
      cost_prop_gt: (B, nprop, ngt) matcher cost (proposals x padded GT).
      nactual_gt: (B,) int actual GT counts per sample.

    Returns dict with:
      per_prop_gt_inds: (B, nprop) int32 -- matched GT index per proposal
        (0 where unmatched, like the reference's zero-init).
      proposal_matched_mask: (B, nprop) float32 1/0.
    """
    b, nprop, ngt = cost_prop_gt.shape

    def rows_are_gt():
        """rows = GT orientation: valid for samples with nactual <= nprop.
        No large-constant padding anywhere -- padded GT rows are excluded
        from the assignment via nlive (the augmenting-path loop does no work
        for them and the caller masks their outputs)."""
        cost_gt_prop = jnp.swapaxes(cost_prop_gt, 1, 2).astype(jnp.float32)
        nlive = jnp.minimum(nactual_gt, nprop)  # clamp keeps dead samples finite
        gt_live = jnp.arange(ngt)[None, :] < nlive[:, None]  # (B, ngt)
        col4row = hungarian_match(cost_gt_prop, nlive)  # (B, ngt)

        per_prop = jnp.zeros((b, nprop), jnp.int32)
        matched = jnp.zeros((b, nprop), jnp.float32)
        gt_ids = jnp.broadcast_to(jnp.arange(ngt, dtype=jnp.int32)[None, :], (b, ngt))
        safe_cols = jnp.where(gt_live, col4row, nprop)  # drop padded GT rows
        per_prop = jax.vmap(lambda pp, c, g: pp.at[c].set(g, mode="drop"))(
            per_prop, safe_cols, gt_ids
        )
        matched = jax.vmap(lambda mm, c: mm.at[c].set(1.0, mode="drop"))(
            matched, safe_cols
        )
        return per_prop, matched

    if ngt <= nprop:
        # common case (64 GT x 128 proposals): nactual <= ngt <= nprop always
        per_prop, matched = rows_are_gt()
        return {"per_prop_gt_inds": per_prop, "proposal_matched_mask": matched}

    # ngt > nprop (nqueries < max_num_obj): samples with nactual <= nprop use
    # the rows=GT orientation above; samples with nactual > nprop use
    # rows=proposals with dead GT columns masked by a large constant.  The
    # big-M path is PRECISION-SAFE only when every proposal can match a live
    # column (nactual >= nprop): then no big entry ever enters the duals.
    # (Using big-M for nactual < nprop loses the assignment to float32
    # rounding: resolution at 1e6 is 0.0625, larger than typical cost gaps.)
    per_prop_a, matched_a = rows_are_gt()

    big = jnp.float32(1e6)
    col_ids = jnp.arange(ngt, dtype=jnp.int32)
    col_live = col_ids[None, :] < nactual_gt[:, None]  # (B, ngt)
    cost_full = jnp.where(
        col_live[:, None, :], cost_prop_gt.astype(jnp.float32), big
    )
    gt4prop = hungarian_match(cost_full)  # (B, nprop) column per proposal
    matched_b = (gt4prop < nactual_gt[:, None]).astype(jnp.float32)
    per_prop_b = jnp.where(matched_b > 0, gt4prop, 0).astype(jnp.int32)

    use_a = (nactual_gt <= nprop)[:, None]
    per_prop = jnp.where(use_a, per_prop_a, per_prop_b)
    matched = jnp.where(use_a, matched_a, matched_b)
    return {"per_prop_gt_inds": per_prop, "proposal_matched_mask": matched}
