"""Optimizer/schedule factory semantics + normalization round-trips."""

import numpy as np
import pytest

from lipvq_tpu.algo.base import lr_schedule_from_config
from lipvq_tpu.utils.obs_utils import normalize_dict, unnormalize_dict


def _op(**kw):
    base = {
        "learning_rate": {
            "initial": 1e-3, "decay_factor": 0.1, "epoch_schedule": [],
            "scheduler_type": "constant",
        },
        "regularization": {"L2": 0.0},
    }
    base["learning_rate"].update(kw)
    return base


def test_constant_with_warmup_schedule():
    sched = lr_schedule_from_config(
        _op(scheduler_type="constant_with_warmup", num_warmup_steps=100)
    )
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(50)) == pytest.approx(5e-4)
    assert float(sched(100)) == pytest.approx(1e-3)
    assert float(sched(10_000)) == pytest.approx(1e-3)


def test_multistep_schedule():
    sched = lr_schedule_from_config(
        _op(scheduler_type="multistep", epoch_schedule=[10, 20],
            decay_factor=0.1)
    )
    assert float(sched(5)) == pytest.approx(1e-3)
    assert float(sched(15)) == pytest.approx(1e-4)
    assert float(sched(25)) == pytest.approx(1e-5)


def test_constant_and_none():
    assert lr_schedule_from_config(_op(scheduler_type="constant")) == 1e-3
    assert lr_schedule_from_config(_op(scheduler_type=None)) == 1e-3


def test_cosine_needs_total_steps():
    with pytest.raises(AssertionError):
        lr_schedule_from_config(_op(scheduler_type="cosine"))
    sched = lr_schedule_from_config(
        _op(scheduler_type="cosine", num_warmup_steps=10),
        num_training_steps=100,
    )
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(100)) < 1e-4


def test_obs_normalize_roundtrip(rng):
    stats = {
        "a": {"offset": np.array([1.0, -2.0], np.float32),
              "scale": np.array([0.5, 2.0], np.float32)},
    }
    x = {"a": rng.standard_normal((7, 2)).astype(np.float32)}
    normed = normalize_dict(x, stats)
    back = unnormalize_dict(normed, stats)
    np.testing.assert_allclose(back["a"], x["a"], rtol=1e-5, atol=1e-6)
    # key without stats passes through untouched
    y = {"b": x["a"].copy()}
    np.testing.assert_array_equal(normalize_dict(y, stats)["b"], y["b"])
