"""On-device optimal linear sum assignment (Jonker-Volgenant style).

The reference matcher round-trips the cost matrix to the host and calls
scipy.optimize.linear_sum_assignment per sample inside the train step
(/root/reference/criterion.py:59-80) -- a device->host sync every iteration.
Here the shortest-augmenting-path algorithm (the same family scipy uses) runs
under jit with static shapes, vmapped over the batch: rows = GT boxes (padded
to max_num_obj), columns = proposals.

Padding trick: rows beyond the actual GT count are given constant cost 0;
constant rows shift every feasible assignment's total by the same amount, so
the optimum restricted to real rows is unchanged, and padded rows soak up
arbitrary leftover columns (masked out by the caller).

Produces an optimal assignment (same total cost as scipy); tie-broken
assignments may differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)


def _lsa_single(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: (R, C) float32 with R <= C. Returns col4row: (R,) int32 columns."""
    r_dim, c_dim = cost.shape
    assert r_dim <= c_dim, "need rows <= cols; transpose the cost matrix"

    u0 = jnp.zeros((r_dim,), jnp.float32)
    v0 = jnp.zeros((c_dim + 1,), jnp.float32)
    p0 = jnp.full((c_dim + 1,), -1, jnp.int32)  # row matched to each column

    def assign_row(i, state):
        u, v, p = state
        p = p.at[c_dim].set(i)
        init = (
            u,
            v,
            p,
            jnp.full((c_dim,), _INF),  # minv
            jnp.full((c_dim,), c_dim, jnp.int32),  # way (parent column)
            jnp.zeros((c_dim + 1,), bool),  # used
            jnp.int32(c_dim),  # j0 (virtual column)
            jnp.bool_(False),  # done
        )

        def cond(s):
            return ~s[-1]

        def body(s):
            u, v, p, minv, way, used, j0, _ = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0] - u[i0] - v[:c_dim]
            upd = jnp.logical_and(~used[:c_dim], cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used[:c_dim], _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            rows = jnp.where(used, p, r_dim)  # r_dim = out-of-bounds => dropped
            u = u.at[rows].add(delta, mode="drop")
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used[:c_dim], minv, minv - delta)
            done = p[j1] == -1
            return (u, v, p, minv, way, used, j1, done)

        u, v, p, minv, way, used, j0, _ = jax.lax.while_loop(cond, body, init)

        # augment: walk parents back to the virtual column
        def aug_cond(s):
            return s[1] != c_dim

        def aug_body(s):
            p, j0 = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p)

    _, _, p = jax.lax.fori_loop(0, r_dim, assign_row, (u0, v0, p0))
    row4col = p[:c_dim]
    col4row = jnp.zeros((r_dim,), jnp.int32)
    cols = jnp.arange(c_dim, dtype=jnp.int32)
    safe_rows = jnp.where(row4col >= 0, row4col, r_dim)
    col4row = col4row.at[safe_rows].set(cols, mode="drop")
    return col4row


@jax.jit
def hungarian_match(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched assignment. cost: (B, R, C) with R <= C -> col4row (B, R) int32.

    Row i of each sample is assigned column col4row[b, i]; all assigned
    columns are distinct; the total cost over rows is minimal.
    """
    return jax.vmap(_lsa_single)(cost.astype(jnp.float32))


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
    if ngt <= nprop:
        # common case (64 GT x 128 proposals): rows = GT.  Rows beyond nactual
        # get constant cost 0: constant rows shift every feasible assignment's
        # total equally, so the optimum over real rows is unchanged, and the
        # sequential augmenting-path loop runs ngt (not nprop) times.
        cost_gt_prop = jnp.swapaxes(cost_prop_gt, 1, 2).astype(jnp.float32)
        gt_live = jnp.arange(ngt)[None, :] < nactual_gt[:, None]  # (B, ngt)
        cost_gt_prop = jnp.where(gt_live[..., None], cost_gt_prop, 0.0)
        col4row = hungarian_match(cost_gt_prop)  # (B, ngt) proposal per GT

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
        return {"per_prop_gt_inds": per_prop, "proposal_matched_mask": matched}

    # ngt > nprop: rows = proposals; columns = GT padded up to >= nprop with a
    # large constant cost.  Padded columns absorb the unmatched proposals at
    # identical cost each, so the optimum over real columns equals scipy's
    # rectangular optimum.
    ncols = max(ngt, nprop)
    big = jnp.float32(1e6)
    col_ids = jnp.arange(ncols, dtype=jnp.int32)
    col_live = col_ids[None, :] < nactual_gt[:, None]  # (B, ncols)
    padded = jnp.full((b, nprop, ncols), big, jnp.float32)
    padded = padded.at[:, :, :ngt].set(cost_prop_gt.astype(jnp.float32))
    cost_full = jnp.where(col_live[:, None, :], padded, big)

    gt4prop = hungarian_match(cost_full)  # (B, nprop) column per proposal
    matched = (gt4prop < nactual_gt[:, None]).astype(jnp.float32)
    per_prop = jnp.where(matched > 0, gt4prop, 0).astype(jnp.int32)
    return {"per_prop_gt_inds": per_prop, "proposal_matched_mask": matched}
