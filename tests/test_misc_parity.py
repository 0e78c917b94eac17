"""LIVE misc parity vs the running reference: the optimizer stack and
the calibration projection.

Optimizer: the reference's torch AdamW (+ bias/1-D no-decay
groups, /root/reference/optimizer.py:5-36), grad clipping
(torch.nn.utils.clip_grad_norm_, engine.py:161-162) and per-iteration
warmup+cosine LR (engine.py:33-55, including the INCLUSIVE <= warmup
boundary) vs our optax chain + make_lr_schedule, stepping the SAME params
with the SAME per-step gradients across the warmup->cosine transition."""

import importlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_import import REF, chdir, install_stubs, reference_available, restore

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference tree absent"),
]

_REF_MODS = {}


def _ref_modules():
    """Import the reference optimizer + engine ONCE per process: re-importing
    engine after restore() re-runs torch._inductor's TORCH_LIBRARY
    registration, which torch forbids (duplicate-namespace RuntimeError).
    The cached module objects keep their (stubbed) globals alive."""
    if not _REF_MODS:
        saved = install_stubs()
        try:
            _REF_MODS["optimizer"] = importlib.import_module("optimizer")
            with chdir(REF):  # engine's module-level dataset configs read
                _REF_MODS["engine"] = importlib.import_module("engine")
        finally:
            restore(saved)
    return _REF_MODS["optimizer"], _REF_MODS["engine"]


SHAPES = {
    "l1.weight": (4, 8),   # 2-D: decayed
    "l1.bias": (4,),       # bias: no decay under filter_biases_wd
    "ln.weight": (8,),     # 1-D non-bias: ALSO no decay (len(shape)==1 rule)
}
ITERS_PER_EPOCH = 3
STEPS = 9  # warm_lr_epochs=2 * 3 = boundary at step 6 -> crosses into cosine


def _args(filter_biases_wd):
    import types

    return types.SimpleNamespace(
        base_lr=5e-4, warm_lr=1e-6, warm_lr_epochs=2, final_lr=1e-6,
        lr_scheduler="cosine", weight_decay=0.1,
        filter_biases_wd=filter_biases_wd, clip_gradient=0.1, max_epoch=10,
        only_prompt_loss=False,
    )


@pytest.mark.parametrize("filter_biases_wd", [True, False])
def test_adamw_clip_schedule_match_torch_reference(filter_biases_wd):
    rng = np.random.default_rng(21)
    init = {k: rng.standard_normal(s).astype(np.float32) for k, s in SHAPES.items()}
    grads = [
        {k: rng.standard_normal(s).astype(np.float32) * 3.0 for k, s in SHAPES.items()}
        for _ in range(STEPS)
    ]
    args = _args(filter_biases_wd)
    max_iters = args.max_epoch * ITERS_PER_EPOCH

    # ---- reference: torch module + reference build_optimizer + engine LR ----
    ref_opt_mod, ref_engine = _ref_modules()

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = torch.nn.Linear(8, 4)
            self.ln = torch.nn.LayerNorm(8, bias=False)

    model = M()
    with torch.no_grad():
        model.l1.weight.copy_(torch.from_numpy(init["l1.weight"]))
        model.l1.bias.copy_(torch.from_numpy(init["l1.bias"]))
        model.ln.weight.copy_(torch.from_numpy(init["ln.weight"]))
    opt = ref_opt_mod.build_optimizer(args, model)
    name_of = {"l1.weight": model.l1.weight, "l1.bias": model.l1.bias,
               "ln.weight": model.ln.weight}
    ref_lrs = []
    for it in range(STEPS):
        ref_lrs.append(
            ref_engine.adjust_learning_rate(args, opt, it / max_iters)
        )
        opt.zero_grad()
        for k, p in name_of.items():
            p.grad = torch.from_numpy(grads[it][k]).clone()
        torch.nn.utils.clip_grad_norm_(model.parameters(), args.clip_gradient)
        opt.step()
    ref_final = {k: p.detach().numpy().copy() for k, p in name_of.items()}

    # ---- ours: optax chain (unit-LR directions, runtime lr) ----
    import jax
    import jax.numpy as jnp

    from coda_neurips2023_tpu.optimizer import build_optimizer, make_lr_schedule

    # map the 1-D leaves to bias-like names so the ndim>1 decay mask mirrors
    # the reference's (len(shape)==1 or endswith('bias')) filter
    params = {k: jnp.asarray(v) for k, v in init.items()}
    tx, schedule = build_optimizer(args, params, ITERS_PER_EPOCH)
    state = tx.init(params)

    @jax.jit
    def step(params, state, g, lr):
        updates, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return params, state

    for it in range(STEPS):
        lr = float(schedule(it))
        assert lr == pytest.approx(ref_lrs[it], rel=1e-6), (
            f"step {it}: lr {lr} vs reference {ref_lrs[it]}"
        )
        g = {k: jnp.asarray(v) for k, v in grads[it].items()}
        params, state = step(params, state, g, jnp.float32(lr))

    for k in SHAPES:
        np.testing.assert_allclose(
            np.asarray(params[k]), ref_final[k], rtol=2e-4, atol=1e-7,
            err_msg=k,
        )


def test_projection_matches_reference_sunrgbd_utils():
    """ops/projection.py vs the reference's SUNRGBD_Calibration
    (datasets/sunrgbd_utils.py:69-204): project_upright_depth_to_image on a
    random cloud with a realistic (non-trivial) Rtilt/K must match -- the
    CLIP crop rectangles are derived from these pixel coordinates."""
    import math

    rng = np.random.default_rng(3)
    # non-trivial Rtilt: small camera tilt about x
    a = 0.18
    rtilt = np.array(
        [[1, 0, 0], [0, math.cos(a), -math.sin(a)], [0, math.sin(a), math.cos(a)]],
        dtype=np.float64,
    )
    kmat = np.array([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]])
    pc = rng.uniform(0.5, 4.0, (257, 3)).astype(np.float64)
    pc[:, 2] += 0.5  # keep depth positive after tilt

    saved = install_stubs()
    try:
        su = importlib.import_module("datasets.sunrgbd_utils")
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            f.write(" ".join(str(x) for x in rtilt.reshape(-1, order="F")) + "\n")
            f.write(" ".join(str(x) for x in kmat.reshape(-1, order="F")) + "\n")
            calib_path = f.name
        calib = su.SUNRGBD_Calibration(calib_path)
        uv_ref, _, d_ref = calib.project_upright_depth_to_image(pc)
    finally:
        restore(saved)

    import jax.numpy as jnp

    from coda_neurips2023_tpu.ops.projection import project_upright_depth_to_image

    uv_ours, d_ours = project_upright_depth_to_image(
        jnp.asarray(pc, jnp.float32),
        jnp.asarray(kmat, jnp.float32),
        jnp.asarray(rtilt, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(uv_ours), uv_ref, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_ours), d_ref, rtol=2e-4, atol=1e-4)


def test_scannet_projection_matches_reference_scannet_utils():
    """ops/projection.project_world_to_image_scannet vs the reference's
    project_3dpoint_to_2dpoint_corners_tensor (scannet_utils.py:650-689):
    world -> camera via the inverse 4x4 pose, then the 3x3 intrinsics block,
    on a random corner batch with a non-trivial pose."""
    import math

    rng = np.random.default_rng(9)
    a = 0.35
    pose = np.eye(4)
    pose[:3, :3] = np.array(
        [[math.cos(a), -math.sin(a), 0],
         [math.sin(a), math.cos(a), 0],
         [0, 0, 1]]
    )
    pose[:3, 3] = [0.4, -0.2, 1.1]
    kmat = np.eye(4)
    kmat[0, 0], kmat[1, 1], kmat[0, 2], kmat[1, 2] = 577.8, 577.8, 320.0, 240.0
    corners = rng.uniform(0.5, 3.0, (2, 5, 8, 3)).astype(np.float64)
    corners[..., 2] += 1.5

    saved = install_stubs()
    try:
        scu = importlib.import_module("datasets.scannet_utils")
        uv_ref, d_ref = scu.project_3dpoint_to_2dpoint_corners_tensor(
            torch.from_numpy(corners),
            K_tensor=torch.from_numpy(np.broadcast_to(kmat, (2, 4, 4)).copy()),
            Rtilt_tensor=torch.from_numpy(np.broadcast_to(pose, (2, 4, 4)).copy()),
        )
    finally:
        restore(saved)

    import jax.numpy as jnp

    from coda_neurips2023_tpu.ops.projection import project_world_to_image_scannet

    uv_ours, d_ours = project_world_to_image_scannet(
        jnp.asarray(corners.reshape(2, 40, 3), jnp.float32),
        jnp.asarray(kmat, jnp.float32),
        jnp.asarray(pose, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(uv_ours), uv_ref.numpy().reshape(2, 40, 2), rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(d_ours), d_ref.numpy().reshape(2, 40), rtol=2e-4, atol=1e-4
    )
