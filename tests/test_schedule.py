import math

import pytest

from clip_ebc_tpu.training.schedule import warmup_cosine_restarts


def _make(**kw):
    defaults = dict(
        base_lr=1e-4,
        warmup_epochs=50,
        warmup_lr=1e-6,
        T_0=5,
        T_mult=2,
        eta_min=1e-7,
    )
    defaults.update(kw)
    return warmup_cosine_restarts(**defaults)


def test_warmup_linear():
    sched = _make()
    assert sched(0) == pytest.approx(1e-6)
    assert sched(25) == pytest.approx((1e-6 + 1e-4) / 2, rel=1e-6)
    # epoch 50 = first post-warmup epoch: peak of cosine
    assert sched(50) == pytest.approx(1e-4)


def test_restart_boundaries():
    sched = _make()
    # Periods: 5, 10, 20, 40 ... restarts at epochs 50+5, 50+15, 50+35
    for restart in (55, 65, 85):
        assert sched(restart) == pytest.approx(1e-4), restart
    # Just before a restart the lr approaches eta_min
    assert sched(64) < sched(65)
    assert sched(64) < 2e-5


def test_t_mult_one():
    sched = _make(T_mult=1, T_0=10, warmup_epochs=0)
    assert sched(0) == pytest.approx(1e-4)
    assert sched(10) == pytest.approx(1e-4)
    assert sched(5) == pytest.approx(1e-7 + (1e-4 - 1e-7) / 2, rel=1e-6)


def test_cosine_midpoint_value():
    sched = _make(warmup_epochs=0, T_0=4, T_mult=2)
    # epoch 1 of period 4: eta_min + (base-eta_min)*(1+cos(pi/4))/2
    expected = 1e-7 + (1e-4 - 1e-7) * (1 + math.cos(math.pi / 4)) / 2
    assert sched(1) == pytest.approx(expected, rel=1e-9)


def test_invalid_args():
    with pytest.raises(ValueError):
        _make(T_0=0)
    with pytest.raises(ValueError):
        _make(eta_min=1.0)  # eta_min > base_lr
    sched = _make()
    with pytest.raises(ValueError):
        sched(-1)
