"""Non-finite-loss abort semantics of the overlapped train loop.

The reference aborts the process the step a loss goes non-finite
(engine.py:155-157, per-step float() sync).  The rebuild batches that check
every `log_every` iterations to keep dispatch overlapped (29% step-time win,
BASELINE.md round 3), which means a NaN can be followed by up to
log_every-1 further optimizer updates -- so the safety invariant is:
train_one_epoch must sys.exit BEFORE returning, and every checkpoint save in
do_train happens only AFTER train_one_epoch returns (main.py:476-494).
Together: no checkpoint can ever contain post-NaN parameters.
"""

import numpy as np
import pytest

from coda_neurips2023_tpu.engine import train_one_epoch


class _State:
    step = 0


def _batches(n):
    for _ in range(n):
        yield {"point_clouds": np.zeros((2, 8, 3), np.float32)}


def _make_step(nan_at, executed):
    def train_step(state, batch, rng):
        executed.append(len(executed))
        loss = np.float32("nan") if len(executed) - 1 == nan_at else np.float32(1.0)
        return state, {"loss": loss}

    return train_step


@pytest.mark.parametrize("nan_at,log_every", [(0, 10), (3, 10), (7, 4)])
def test_nan_loss_aborts_before_return(nan_at, log_every, capsys):
    executed = []
    returned = []

    def run():
        state, _ = train_one_epoch(
            _make_step(nan_at, executed), _State(), _batches(40), rng=None,
            log_every=log_every,
        )
        returned.append(state)  # a save here would be the poisoned-ckpt bug

    with pytest.raises(SystemExit):
        run()
    assert not returned, "train_one_epoch returned after a non-finite loss"
    # bounded lateness: at most log_every-1 extra steps ran past the NaN
    assert len(executed) - 1 - nan_at <= log_every - 1
    assert "not finite" in capsys.readouterr().out


def test_epoch_tail_drain_catches_last_iter_nan():
    """A NaN on the final iteration (never reaching an `it % log_every == 0`
    checkpoint) must still abort via the end-of-epoch drain (engine.py:320)."""
    executed = []
    with pytest.raises(SystemExit):
        train_one_epoch(
            _make_step(5, executed), _State(), _batches(6), rng=None, log_every=100
        )
    assert len(executed) == 6


def test_finite_epoch_returns_state():
    executed = []
    state, metrics = train_one_epoch(
        _make_step(-1, executed), _State(), _batches(12), rng=None, log_every=5
    )
    assert len(executed) == 12
    assert float(metrics["loss"]) == 1.0
