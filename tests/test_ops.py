"""Golden-vector parity tests for the point/box op layer (SURVEY.md section 4)."""

import numpy as np
import pytest
import scipy.optimize

import jax
import jax.numpy as jnp

from coda_neurips2023_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    generalized_box3d_iou,
    group_points,
    hungarian_match,
    three_interpolate,
    three_nn,
)
from coda_neurips2023_tpu.ops.grouping import _group_points_xla
from coda_neurips2023_tpu.ops.hungarian import matcher_assignments
from coda_neurips2023_tpu.ops.interpolate import interpolation_weights
from coda_neurips2023_tpu.ops import box_ops
from coda_neurips2023_tpu.ops.giou import clip_polygon_area

from golden import (
    ball_query_golden,
    fps_golden,
    giou_golden,
    polygon_area_golden,
    polygon_clip_golden,
    three_nn_golden,
)


def rand_pc(rng, b, n, scale=3.0):
    return (rng.standard_normal((b, n, 3)) * scale).astype(np.float32)


class TestFPS:
    def test_matches_golden(self):
        rng = np.random.default_rng(0)
        xyz = rand_pc(rng, 3, 257)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 33, use_pallas=False))
        want = fps_golden(xyz, 33)
        np.testing.assert_array_equal(got, want)

    def test_near_origin_points_skipped(self):
        rng = np.random.default_rng(1)
        xyz = rand_pc(rng, 2, 64)
        xyz[:, 5:20] = 0.0  # |p|^2 <= 1e-3 -> never selected
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16, use_pallas=False))
        assert not np.any((got >= 5) & (got < 20))
        np.testing.assert_array_equal(got, fps_golden(xyz, 16))

    def test_seed_is_zero(self):
        rng = np.random.default_rng(2)
        xyz = rand_pc(rng, 2, 50)
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8, use_pallas=False))
        assert np.all(got[:, 0] == 0)

    def test_pallas_interpret_matches_xla(self):
        # Pallas kernel correctness via interpret mode on CPU
        from jax.experimental.pallas import tpu as pltpu
        from coda_neurips2023_tpu.ops.pallas_fps import fps_pallas

        rng = np.random.default_rng(3)
        xyz = rand_pc(rng, 2, 200)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fps_pallas(jnp.asarray(xyz), 16))
        np.testing.assert_array_equal(got, fps_golden(xyz, 16))


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.8, 8), (2.0, 16)])
    def test_matches_golden(self, radius, nsample):
        rng = np.random.default_rng(4)
        xyz = rand_pc(rng, 2, 128, scale=1.0)
        new_xyz = xyz[:, :32]
        got = np.asarray(ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        want = ball_query_golden(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_no_hits_gives_zeros(self):
        xyz = np.ones((1, 16, 3), dtype=np.float32) * 100.0
        new_xyz = np.zeros((1, 4, 3), dtype=np.float32)
        got = np.asarray(ball_query(0.5, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        np.testing.assert_array_equal(got, 0)

    @pytest.mark.parametrize(
        "B,N,M,radius,nsample,scale",
        [
            (2, 300, 33, 0.4, 8, 0.3),  # dense, 3 chunks, overflow + padded rows
            (1, 300, 17, 0.15, 8, 1.0),  # sparse: zero-hit rows
            (1, 260, 19, 0.4, 64, 0.3),  # k=64: full window sweep at W=8
        ],
    )
    def test_pallas_v3_interpret_matches_golden(
        self, monkeypatch, B, N, M, radius, nsample, scale
    ):
        # windowed-insert kernel correctness via interpret mode on CPU;
        # chunk size shrunk so multi-chunk paths run in test time
        from jax.experimental.pallas import tpu as pltpu
        import coda_neurips2023_tpu.ops.pallas_ball_query as bq

        monkeypatch.setattr(bq, "_NC", 128)
        rng = np.random.default_rng(11)
        xyz = rand_pc(rng, B, N, scale=scale)
        new_xyz = np.concatenate(
            [xyz[:, : M - 2], np.full((B, 2, 3), 50.0, np.float32)], axis=1
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                bq.ball_query_pallas_v3(
                    radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)
                )
            )
        want = ball_query_golden(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize(
        "B,N,M,radius,nsample,scale,ws,cluster",
        [
            # dense (>k hits per center: exercises the k-smallest-index cap),
            # multi-block extraction, padded center rows
            (2, 300, 33, 0.5, 8, 0.25, 128, False),
            # sparse: zero-hit rows + far centers
            (1, 300, 17, 0.15, 8, 1.0, 128, False),
            # ws < blk with spread-out centers: windows overflow -> the
            # whole call takes the v3 fallback branch of lax.cond
            (2, 260, 19, 0.4, 8, 0.3, 64, False),
            # ws < blk with CLUSTERED centers: non-trivial aligned window
            # starts without overflow (the intended fast path)
            (2, 300, 25, 0.1, 8, 0.5, 64, True),
        ],
    )
    def test_pallas_sorted_interpret_matches_golden(
        self, monkeypatch, B, N, M, radius, nsample, scale, ws, cluster
    ):
        # sort-assisted windowed kernel correctness via interpret mode on
        # CPU; block size shrunk so multi-block windowing runs in test time
        from jax.experimental.pallas import tpu as pltpu
        import coda_neurips2023_tpu.ops.pallas_ball_query as bq
        import coda_neurips2023_tpu.ops.pallas_ball_query_sorted as bqs

        monkeypatch.setattr(bq, "_NC", 128)
        monkeypatch.setattr(bqs, "_BLK", 128)
        monkeypatch.setattr(bqs, "_WS", ws)
        monkeypatch.setattr(bqs, "_TM", 8)
        monkeypatch.setattr(bqs, "_LANE", 8)
        rng = np.random.default_rng(13)
        xyz = rand_pc(rng, B, N, scale=scale)
        if cluster:
            new_xyz = (0.15 * rand_pc(rng, B, M, scale=1.0) + 0.2).astype(
                np.float32
            )
        else:
            new_xyz = np.concatenate(
                [xyz[:, : M - 2], np.full((B, 2, 3), 50.0, np.float32)], axis=1
            )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                bqs.ball_query_pallas_sorted(
                    radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)
                )
            )
        want = ball_query_golden(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize(
        "B,N,M,radius,nsample,scale,ws,cluster",
        [
            (2, 300, 33, 0.5, 8, 0.25, 128, False),
            (1, 300, 17, 0.15, 8, 1.0, 128, False),  # zero-hit rows
            (2, 260, 19, 0.4, 8, 0.3, 64, False),  # overflow -> fallback
            (2, 300, 25, 0.1, 8, 0.5, 64, True),
        ],
    )
    def test_fused_bq_gather_matches_two_op_path(
        self, monkeypatch, B, N, M, radius, nsample, scale, ws, cluster
    ):
        # fused ball query + coordinate gather: idx must equal the golden
        # ball query, grouped must equal take_along_axis(xyz, idx) bit-exactly
        # (reference fill semantics incl. the zero-hit -> index-0 gather)
        from jax.experimental.pallas import tpu as pltpu
        import coda_neurips2023_tpu.ops.pallas_ball_query as bq
        import coda_neurips2023_tpu.ops.pallas_ball_query_sorted as bqs

        monkeypatch.setattr(bq, "_NC", 128)
        monkeypatch.setattr(bqs, "_BLK", 128)
        monkeypatch.setattr(bqs, "_WS", ws)
        monkeypatch.setattr(bqs, "_TM", 8)
        monkeypatch.setattr(bqs, "_LANE", 8)
        rng = np.random.default_rng(13)
        xyz = rand_pc(rng, B, N, scale=scale)
        if cluster:
            new_xyz = (0.15 * rand_pc(rng, B, M, scale=1.0) + 0.2).astype(
                np.float32
            )
        else:
            new_xyz = np.concatenate(
                [xyz[:, : M - 2], np.full((B, 2, 3), 50.0, np.float32)], axis=1
            )
        with pltpu.force_tpu_interpret_mode():
            idx, grouped = jax.tree.map(
                np.asarray,
                bqs.ball_query_and_group_sorted(
                    radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)
                ),
            )
        want_idx = ball_query_golden(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(idx, want_idx)
        want_g = np.stack([xyz[b][want_idx[b]] for b in range(B)])
        np.testing.assert_array_equal(grouped, want_g)


class TestGatherGroup:
    def test_gather(self):
        rng = np.random.default_rng(5)
        pts = rng.standard_normal((2, 10, 4)).astype(np.float32)
        idx = rng.integers(0, 10, size=(2, 6)).astype(np.int32)
        got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_allclose(got, want)

    def test_group(self):
        rng = np.random.default_rng(6)
        feats = rng.standard_normal((2, 10, 5)).astype(np.float32)
        idx = rng.integers(0, 10, size=(2, 3, 4)).astype(np.int32)
        got = np.asarray(group_points(jnp.asarray(feats), jnp.asarray(idx)))
        want = np.stack([feats[b][idx[b]] for b in range(2)])
        np.testing.assert_allclose(got, want)

    def test_gather_grad_is_scatter_add(self):
        pts = jnp.ones((1, 5, 2))
        idx = jnp.asarray([[0, 0, 3]], dtype=jnp.int32)
        g = jax.grad(lambda p: jnp.sum(gather_points(p, idx)))(pts)
        want = np.zeros((1, 5, 2))
        want[0, 0] = 2.0
        want[0, 3] = 1.0
        np.testing.assert_allclose(np.asarray(g), want)

    @pytest.mark.parametrize(
        "B,N,C,M,K",
        [(2, 1000, 3, 64, 64), (1, 20000, 3, 128, 64), (2, 555, 6, 32, 16)],
    )
    def test_pallas_group_gather_bit_exact(self, B, N, C, M, K):
        """The TPU two-level one-hot gather (interpret mode) is BIT-exact vs
        take_along_axis -- the bf16x3 payload split + one-hot matmul must
        reconstruct f32 exactly (ops/pallas_group_gather.py docstring);
        covers non-multiple-of-128 N (tile padding) and C=6 (color path)."""
        from jax.experimental.pallas import tpu as pltpu

        from coda_neurips2023_tpu.ops.pallas_group_gather import group_points_pallas

        rng = np.random.default_rng(11)
        feats = (rng.standard_normal((B, N, C)) * 4).astype(np.float32)
        idx = rng.integers(0, N, (B, M, K)).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(group_points_pallas(jnp.asarray(feats), jnp.asarray(idx)))
        want = np.asarray(_group_points_xla(jnp.asarray(feats), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, want)

    def test_gather_points_pallas_route_bit_exact(self, monkeypatch):
        """gather_points' TPU route (grouped-view reuse of the Pallas kernel,
        M % 64 == 0) == the take_along_axis path."""
        from jax.experimental.pallas import tpu as pltpu

        from coda_neurips2023_tpu.ops import grouping

        rng = np.random.default_rng(13)
        # N >= _PALLAS_GATHER_MIN_N so the monkeypatched route really takes
        # the Pallas view path (smaller N falls back to take_along_axis)
        pts = jnp.asarray((rng.standard_normal((2, 4100, 3)) * 4).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 4100, (2, 128)).astype(np.int32))
        want = np.asarray(jnp.take_along_axis(pts, idx[..., None], axis=1))
        monkeypatch.setattr(grouping, "_PALLAS_GATHER", "1")
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(gather_points(pts, idx))
        np.testing.assert_array_equal(got, want)

    def test_pallas_group_gather_vjp_matches_xla(self):
        """custom_vjp backward (explicit scatter-add) == XLA's derived
        take_along_axis transpose, duplicates included."""
        from jax.experimental.pallas import tpu as pltpu

        from coda_neurips2023_tpu.ops.grouping import (
            _group_points_fast,
            _group_points_xla,
        )

        rng = np.random.default_rng(12)
        feats = jnp.asarray(rng.standard_normal((2, 50, 3)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 50, (2, 8, 4)).astype(np.int32))
        g_want = jax.grad(lambda f: jnp.sum(jnp.sin(_group_points_xla(f, idx))))(feats)
        with pltpu.force_tpu_interpret_mode():
            g_got = jax.grad(
                lambda f: jnp.sum(jnp.sin(_group_points_fast(f, idx)))
            )(feats)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-6)


class TestInterpolate:
    def test_three_nn(self):
        rng = np.random.default_rng(7)
        unknown = rand_pc(rng, 2, 20)
        known = rand_pc(rng, 2, 9)
        d2, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        wd2, widx = three_nn_golden(unknown, known)
        np.testing.assert_array_equal(np.asarray(idx), widx)
        np.testing.assert_allclose(np.asarray(d2), wd2, rtol=1e-5, atol=1e-5)

    def test_three_interpolate(self):
        rng = np.random.default_rng(8)
        unknown = rand_pc(rng, 1, 12)
        known = rand_pc(rng, 1, 6)
        feats = rng.standard_normal((1, 6, 4)).astype(np.float32)
        d2, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        w = interpolation_weights(d2)
        out = three_interpolate(jnp.asarray(feats), idx, w)
        wn = np.asarray(w)
        gathered = feats[0][np.asarray(idx)[0]]  # (N, 3, C)
        want = np.einsum("nk,nkc->nc", wn[0], gathered)[None]
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)


def random_boxes(rng, b, k, rotated=True):
    centers = rng.uniform(-2, 2, size=(b, k, 3)).astype(np.float32)
    sizes = rng.uniform(0.3, 2.0, size=(b, k, 3)).astype(np.float32)
    angles = (
        rng.uniform(-np.pi, np.pi, size=(b, k)).astype(np.float32)
        if rotated
        else np.zeros((b, k), np.float32)
    )
    corners = np.asarray(
        box_ops.get_3d_box_batch(jnp.asarray(sizes), jnp.asarray(angles), jnp.asarray(centers))
    )
    return corners


class TestPolygonClip:
    def test_random_quads(self):
        rng = np.random.default_rng(9)
        for _ in range(50):
            c1 = rng.uniform(-1, 1, 2)
            c2 = rng.uniform(-1, 1, 2)
            s1, s2 = rng.uniform(0.2, 1.5, 2), rng.uniform(0.2, 1.5, 2)
            a1, a2 = rng.uniform(-np.pi, np.pi, 2)

            def quad(c, s, a):
                # CCW rect footprint like the reference's [3,2,1,0]x(x,z) slice
                base = np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32)
                base = base * np.asarray(s, np.float32) / 2
                rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
                return base @ rot.T + np.asarray(c, np.float32)

            q1, q2 = quad(c1, s1, a1), quad(c2, s2, a2)
            got = float(clip_polygon_area(jnp.asarray(q1)[None], jnp.asarray(q2)[None])[0])
            want = polygon_area_golden(polygon_clip_golden(q1, q2))
            assert got == pytest.approx(want, rel=1e-4, abs=1e-5)


class TestGIoU:
    @pytest.mark.parametrize("rotated", [True, False])
    def test_matches_golden(self, rotated):
        rng = np.random.default_rng(10)
        c1 = random_boxes(rng, 2, 6, rotated)
        c2 = random_boxes(rng, 2, 5, rotated)
        nums = np.array([5, 3], np.int32)
        got = np.asarray(
            generalized_box3d_iou(jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(nums), rotated)
        )
        want = giou_golden(c1, c2, nums, rotated)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_identical_boxes_matches_golden(self):
        # NB: exactly coincident boxes are a degenerate case of the reference's
        # strict-inequality clipping (intersection collapses to 0 and the gIoU
        # falls back to the enclosing-volume term); we reproduce the golden
        # behavior rather than the mathematically-ideal IoU=1.
        rng = np.random.default_rng(11)
        c = random_boxes(rng, 1, 3, True)
        g = np.asarray(
            generalized_box3d_iou(jnp.asarray(c), jnp.asarray(c), jnp.asarray([3]), True)
        )
        want = giou_golden(c, c, np.asarray([3], np.int32), True)
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-4)
        # nearly-identical boxes (realistic case): still golden-exact. (Note
        # the value is < 1 even at perfect overlap for rotated boxes: the
        # reference's enclosing term is the axis-aligned bounding volume.)
        c2 = c + 1e-4
        g2 = np.asarray(
            generalized_box3d_iou(jnp.asarray(c), jnp.asarray(c2), jnp.asarray([3]), True)
        )
        w2 = giou_golden(c, c2, np.asarray([3], np.int32), True)
        np.testing.assert_allclose(g2, w2, rtol=1e-4, atol=1e-4)

    def test_differentiable(self):
        rng = np.random.default_rng(12)
        c1 = jnp.asarray(random_boxes(rng, 1, 2, True))
        c2 = jnp.asarray(random_boxes(rng, 1, 2, True))

        def f(c):
            return jnp.sum(generalized_box3d_iou(c, c2, jnp.asarray([2]), True))

        g = jax.grad(f)(c1)
        assert np.all(np.isfinite(np.asarray(g)))


class TestHungarian:
    def test_matches_scipy_total_cost(self):
        rng = np.random.default_rng(13)
        for _ in range(20):
            r, c = rng.integers(1, 20), rng.integers(20, 40)
            cost = rng.standard_normal((1, r, c)).astype(np.float32) * 10
            col4row = np.asarray(hungarian_match(jnp.asarray(cost)))[0]
            ri, ci = scipy.optimize.linear_sum_assignment(cost[0])
            got_total = cost[0][np.arange(r), col4row].sum()
            want_total = cost[0][ri, ci].sum()
            assert len(set(col4row.tolist())) == r  # distinct columns
            assert got_total == pytest.approx(want_total, rel=1e-4, abs=1e-4)

    def test_nlive_row_exclusion_matches_scipy(self):
        """Rows >= nlive are excluded from the problem (the fast path the
        matcher uses for padded GT): optimum over live rows must equal scipy
        on the live sub-matrix, with distinct columns."""
        rng = np.random.default_rng(21)
        for _ in range(25):
            r, c = int(rng.integers(2, 64)), 128
            nlive = int(rng.integers(1, r + 1))
            cost = rng.standard_normal((1, r, c)).astype(np.float32) * 10
            col4row = np.asarray(
                hungarian_match(jnp.asarray(cost), jnp.asarray([nlive]))
            )[0]
            ri, ci = scipy.optimize.linear_sum_assignment(cost[0, :nlive])
            got = cost[0][np.arange(nlive), col4row[:nlive]].sum()
            want = cost[0][ri, ci].sum()
            assert len(set(col4row[:nlive].tolist())) == nlive
            assert got == pytest.approx(want, rel=1e-4, abs=1e-4)

    def test_matcher_assignments_match_reference_semantics(self):
        rng = np.random.default_rng(14)
        b, nprop, ngt = 3, 16, 8
        cost = rng.standard_normal((b, nprop, ngt)).astype(np.float32)
        nactual = np.array([8, 3, 0], np.int32)
        out = matcher_assignments(jnp.asarray(cost), jnp.asarray(nactual))
        per_prop = np.asarray(out["per_prop_gt_inds"])
        mask = np.asarray(out["proposal_matched_mask"])
        for bi in range(b):
            want_pp = np.zeros(nprop, np.int64)
            want_mask = np.zeros(nprop, np.float32)
            if nactual[bi] > 0:
                ri, ci = scipy.optimize.linear_sum_assignment(cost[bi, :, : nactual[bi]])
                got_pairs_cost = 0.0
                for p in range(nprop):
                    if mask[bi, p]:
                        got_pairs_cost += cost[bi, p, per_prop[bi, p]]
                want_cost = cost[bi][ri, ci].sum()
                assert got_pairs_cost == pytest.approx(want_cost, rel=1e-4, abs=1e-4)
                assert mask[bi].sum() == nactual[bi]
            else:
                np.testing.assert_array_equal(per_prop[bi], want_pp)
                np.testing.assert_array_equal(mask[bi], want_mask)


class TestBoxOps:
    def test_angle_roundtrip(self):
        angles = jnp.asarray(np.linspace(0.01, 2 * np.pi - 0.01, 37, dtype=np.float32))
        cls, res = box_ops.angle2class(angles, 12)
        back = box_ops.class2angle(cls, res, 12)
        # class2angle wraps to (-pi, pi]
        want = np.asarray(angles)
        want = np.where(want > np.pi, want - 2 * np.pi, want)
        np.testing.assert_allclose(np.asarray(back), want, rtol=1e-5, atol=1e-5)

    def test_angle2class_matches_reference_scalar(self):
        # scalar reference implementation from the dataset config
        def ref_angle2class(angle, num_class=12):
            angle = angle % (2 * np.pi)
            angle_per_class = 2 * np.pi / float(num_class)
            shifted = (angle + angle_per_class / 2) % (2 * np.pi)
            cid = int(shifted / angle_per_class)
            res = shifted - (cid * angle_per_class + angle_per_class / 2)
            return cid, res

        rng = np.random.default_rng(15)
        angles = rng.uniform(-np.pi, np.pi, 64).astype(np.float32)
        cls, res = box_ops.angle2class(jnp.asarray(angles), 12)
        for i, a in enumerate(angles):
            wc, wr = ref_angle2class(float(a))
            assert int(cls[i]) == wc
            assert float(res[i]) == pytest.approx(wr, abs=1e-5)

    def test_flip_axis_roundtrip(self):
        rng = np.random.default_rng(16)
        pc = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(box_ops.flip_axis_to_depth(box_ops.flip_axis_to_camera(pc))),
            np.asarray(pc),
            rtol=1e-6,
        )

    def test_shift_scale_points(self):
        rng = np.random.default_rng(17)
        pts = rng.uniform(-4, 4, (2, 10, 3)).astype(np.float32)
        mins = pts.min(axis=1)
        maxs = pts.max(axis=1)
        out = np.asarray(
            box_ops.shift_scale_points(jnp.asarray(pts), (jnp.asarray(mins), jnp.asarray(maxs)))
        )
        assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5

    def test_corners_shape_and_center(self):
        rng = np.random.default_rng(18)
        sizes = jnp.asarray(rng.uniform(0.5, 2, (2, 4, 3)).astype(np.float32))
        angles = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 4)).astype(np.float32))
        centers = jnp.asarray(rng.uniform(-2, 2, (2, 4, 3)).astype(np.float32))
        corners = box_ops.get_3d_box_batch(sizes, angles, centers)
        assert corners.shape == (2, 4, 8, 3)
        np.testing.assert_allclose(
            np.asarray(jnp.mean(corners, axis=2)), np.asarray(centers), rtol=1e-4, atol=1e-4
        )


def test_numpy_twins_match_jnp():
    """Host-pipeline numpy corner math == device jnp versions (the dataset
    __getitem__ must not touch jax: axon roundtrips + fork-worker safety)."""
    import jax.numpy as jnp

    from coda_neurips2023_tpu.ops import box_ops as B

    rng = np.random.default_rng(0)
    sizes = rng.uniform(0.2, 2.0, (4, 7, 3)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, (4, 7)).astype(np.float32)
    centers = rng.uniform(-3, 3, (4, 7, 3)).astype(np.float32)

    np.testing.assert_allclose(
        B.flip_axis_to_camera_np(centers),
        np.asarray(B.flip_axis_to_camera(jnp.asarray(centers))), rtol=1e-6)
    np.testing.assert_allclose(
        B.flip_axis_to_depth_np(centers),
        np.asarray(B.flip_axis_to_depth(jnp.asarray(centers))), rtol=1e-6)
    np.testing.assert_allclose(
        B.get_3d_box_batch_np(sizes, angles, centers),
        np.asarray(B.get_3d_box_batch(jnp.asarray(sizes), jnp.asarray(angles), jnp.asarray(centers))),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        B.get_3d_box_batch_xyz_np(sizes, angles, centers),
        np.asarray(B.get_3d_box_batch_xyz(jnp.asarray(sizes), jnp.asarray(angles), jnp.asarray(centers))),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        B.my_compute_box_3d_np(centers, sizes, angles),
        np.asarray(B.my_compute_box_3d(jnp.asarray(centers), jnp.asarray(sizes), jnp.asarray(angles))),
        rtol=1e-5, atol=1e-5)
    c_np, r_np = B.angle2class_np(angles, 12)
    c_j, r_j = B.angle2class(jnp.asarray(angles), 12)
    np.testing.assert_array_equal(c_np, np.asarray(c_j))
    np.testing.assert_allclose(r_np, np.asarray(r_j), rtol=1e-5, atol=1e-6)


class TestBallQueryAdaptive:
    def test_extract_and_onehot_paths_match_golden(self, monkeypatch):
        """The per-chunk extraction/one-hot gate (pallas_ball_query._EXTRACT_T)
        is exercised on BOTH branches (dense cluster -> one-hot, sparse ->
        extraction) with small chunks, against the oracle."""
        from jax.experimental.pallas import tpu as pltpu

        from coda_neurips2023_tpu.ops import pallas_ball_query as pbq
        from tests.golden import ball_query_golden

        monkeypatch.setattr(pbq, "_NC", 128)
        rng = np.random.default_rng(0)
        B, N, M, K = 2, 512, 24, 16
        for scale in (0.35, 1.0, 3.0):
            xyz = rng.uniform(-scale, scale, (B, N, 3)).astype(np.float32)
            # dense cluster: >16 hits in one chunk forces the one-hot branch
            xyz[:, 40:120] = xyz[:, 40:41] + rng.normal(
                0, 0.01, (B, 80, 3)
            ).astype(np.float32)
            ctr = xyz[:, :: N // M][:, :M]
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(
                    pbq.ball_query_pallas(0.4, K, jnp.asarray(xyz), jnp.asarray(ctr))
                )
            want = ball_query_golden(0.4, K, xyz, ctr)
            np.testing.assert_array_equal(got, want)
