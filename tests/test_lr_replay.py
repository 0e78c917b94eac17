"""Stage-2 epoch-reset LR replay (reference main.py:568-573 + engine.py:33-55)."""

import types

import numpy as np

import jax

from coda_neurips2023_tpu.optimizer import build_optimizer, make_lr_schedule


def sched_args(**over):
    base = dict(
        base_lr=2e-4, warm_lr=1e-6, warm_lr_epochs=18, final_lr=1e-6,
        lr_scheduler="cosine", weight_decay=0.1, filter_biases_wd=False,
        clip_gradient=0.1, max_epoch=1080,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def test_host_and_device_schedules_agree():
    args = sched_args()
    ipe = 7
    host = make_lr_schedule(args, ipe, host=True)
    dev = make_lr_schedule(args, ipe)
    for step in [0, 1, 17, 18 * 7 - 1, 18 * 7, 18 * 7 + 1, 500, 5000, 1080 * 7 - 1]:
        np.testing.assert_allclose(host(step), float(dev(step)), rtol=1e-5, atol=1e-10)


def test_lr_replays_warmup_every_reset_cycle():
    """A 150-epoch run with reset_epoch_periodically=50 must show 3 identical
    warmup+early-cosine cycles: LR at (epoch % 50 == e) is the same for every
    cycle, and each cycle starts back at ~warm_lr."""
    args = sched_args(warm_lr_epochs=18, max_epoch=1080)
    ipe = 3
    host = make_lr_schedule(args, ipe, host=True)
    reset = 50
    trace = []
    for epoch in range(150):
        eff = epoch % reset
        for it in range(ipe):
            trace.append(host(eff * ipe + it))
    trace = np.asarray(trace)
    cycle = reset * ipe
    np.testing.assert_allclose(trace[:cycle], trace[cycle : 2 * cycle], rtol=0)
    np.testing.assert_allclose(trace[:cycle], trace[2 * cycle : 3 * cycle], rtol=0)
    # warmup restarts: the first iter of each cycle is near warm_lr, far below
    # the end of the previous cycle
    assert trace[cycle] == trace[0]
    assert trace[cycle - 1] > 10 * trace[cycle]
    # inside a cycle the warmup rises for warm_lr_epochs then cosine decays
    assert trace[18 * ipe] == max(trace[: 19 * ipe])


def test_train_step_consumes_batch_lr():
    """batch['lr']=0 must freeze the params (runtime-LR plumbing)."""
    import jax.numpy as jnp

    from tests.test_train import tiny_setup
    from coda_neurips2023_tpu.engine import create_train_state, make_train_step

    cfg, model, batch, criterion, tx, schedule = tiny_setup(batch_size=2)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, criterion, tx, lr_schedule=schedule)
    new_state, metrics = step(state, {**batch, "lr": np.float32(0.0)}, jax.random.PRNGKey(1))
    assert float(metrics["lr"]) == 0.0
    leaves0 = jax.tree.leaves(state.params)
    leaves1 = jax.tree.leaves(new_state.params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a nonzero lr moves them
    new_state2, m2 = step(state, {**batch, "lr": np.float32(1e-3)}, jax.random.PRNGKey(1))
    assert float(m2["lr"]) == np.float32(1e-3)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, jax.tree.leaves(new_state2.params))
    )
    assert moved
