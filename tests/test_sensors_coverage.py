"""Contract tests for the round-4 sensors and collection statistics.

obj_state (sim/kitchen.py `_obj_state_obs`) is the fixed-dim analogue of
the reference's per-task ``object`` sensor (reference
robocasa/environments/kitchen/kitchen.py:1232-1302); the flagship
multi-task runs and every PnP result ride on its slot layout, so a
silent slot swap must turn a test red — not silently zero out PnP
learning. The coverage sidecar (`collect_kitchen_suite._write_coverage`)
feeds the retry-bias analysis in BASELINE.md; its per-lang rates and
placement_std_ratio are asserted on a synthetic attempt list.
"""

import json
from collections import OrderedDict

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from lipvq_tpu.robocasa.sim.kitchen import Kitchen  # noqa: E402
from lipvq_tpu.scripts.collect_kitchen_suite import _write_coverage  # noqa: E402


class _FakeEnv:
    """Just enough of Kitchen for _obj_state_obs: named objects with
    known poses."""

    OBJ_STATE_SLOTS = Kitchen.OBJ_STATE_SLOTS

    def __init__(self, poses):
        self.objects = OrderedDict((n, None) for n in poses)
        self._poses = poses

    def object_pos(self, name):
        return np.asarray(self._poses[name][0], dtype=float)

    def object_quat(self, name):
        return np.asarray(self._poses[name][1], dtype=float)


def _slot(vec, i):
    return vec[10 * i:10 * (i + 1)]


def test_obj_state_slot_order_obj_then_container():
    """Primary object 'obj' takes slot 0 and 'container' slot 1 even
    when alphabetical order says otherwise; extras beyond the slot count
    are dropped."""
    poses = {
        # alphabetically 'aaa_distractor' < 'container' < 'obj': the
        # layout rule must override sorted order for the named slots
        "aaa_distractor": ([9.0, 9.0, 9.0], [1, 0, 0, 0]),
        "obj": ([1.0, 2.0, 3.0], [0, 1, 0, 0]),
        "container": ([4.0, 5.0, 6.0], [0, 0, 1, 0]),
    }
    eef = np.array([0.5, 0.5, 0.5])
    vec = Kitchen._obj_state_obs(_FakeEnv(poses), eef)
    assert vec.shape == (10 * Kitchen.OBJ_STATE_SLOTS,)
    assert vec.dtype == np.float32
    s0, s1 = _slot(vec, 0), _slot(vec, 1)
    np.testing.assert_allclose(s0[:3], [1, 2, 3])          # obj pos
    np.testing.assert_allclose(s0[3:7], [0, 1, 0, 0])      # obj quat
    np.testing.assert_allclose(s0[7:10], [0.5, 1.5, 2.5])  # pos - eef
    np.testing.assert_allclose(s1[:3], [4, 5, 6])          # container
    np.testing.assert_allclose(s1[3:7], [0, 0, 1, 0])
    np.testing.assert_allclose(s1[7:10], [3.5, 4.5, 5.5])
    # the distractor (would win sorted order) must NOT appear anywhere
    assert not np.isclose(vec, 9.0).any()


def test_obj_state_sorted_fallback_and_zero_pad():
    """Without the conventional names, slots fill in sorted-name order;
    missing slots zero-pad; no objects -> all zeros."""
    poses = {"banana": ([1.0, 1.0, 1.0], [1, 0, 0, 0])}
    vec = Kitchen._obj_state_obs(_FakeEnv(poses), np.zeros(3))
    np.testing.assert_allclose(_slot(vec, 0)[:3], [1, 1, 1])
    np.testing.assert_allclose(_slot(vec, 1), np.zeros(10))

    vec = Kitchen._obj_state_obs(_FakeEnv({}), np.zeros(3))
    np.testing.assert_allclose(vec, np.zeros(10 * Kitchen.OBJ_STATE_SLOTS))

    poses = {
        "zebra": ([2.0, 0.0, 0.0], [1, 0, 0, 0]),
        "apple": ([3.0, 0.0, 0.0], [1, 0, 0, 0]),
    }
    vec = Kitchen._obj_state_obs(_FakeEnv(poses), np.zeros(3))
    np.testing.assert_allclose(_slot(vec, 0)[:3], [3, 0, 0])  # apple first
    np.testing.assert_allclose(_slot(vec, 1)[:3], [2, 0, 0])


def test_obj_state_real_env_binds_primary_object():
    """Integration: on a live PnP env, slot 0 IS the task's primary
    object ('obj'): its world pos, quat, and eef-relative pos match the
    per-object sensors in the same observation."""
    from lipvq_tpu.robocasa.sim import REGISTERED_KITCHEN_ENVS

    env = REGISTERED_KITCHEN_ENVS["PnPCounterToCab"](seed=11)
    try:
        obs = env.reset()
        assert "obj" in env.objects
        vec = obs["obj_state"]
        assert vec.shape == (10 * Kitchen.OBJ_STATE_SLOTS,)
        np.testing.assert_allclose(vec[:3], obs["obj_pos"], atol=1e-6)
        np.testing.assert_allclose(vec[3:7], obs["obj_quat"], atol=1e-6)
        np.testing.assert_allclose(
            vec[7:10], obs["obj_to_robot0_eef_pos"], atol=1e-6)
        np.testing.assert_allclose(
            vec[7:10], vec[:3] - obs["robot0_eef_pos"], atol=1e-6)
    finally:
        env.close()


def test_coverage_sidecar_stats(tmp_path):
    """per-lang success rates and placement_std_ratio_xyz computed from
    a synthetic attempt list with known answers."""
    rng = np.random.default_rng(0)
    attempts = []
    # lang A: 3/4 succeed; lang B: 0/2. Successful starts are drawn from
    # HALF the spread of all starts on x, same spread on y/z.
    all_x = [0.0, 2.0, 0.5, 1.5, -1.0, 3.0]
    ok = [True, True, True, False, False, False]
    langs = ["A", "A", "A", "A", "B", "B"]
    # make the successful-x std exactly half the attempted-x std by
    # construction: successes at {0, 2, 0.5} vs all at wider spread
    for x, s, lang in zip(all_x, ok, langs):
        attempts.append({
            "success": bool(s), "layout": 0, "style": 0, "lang": lang,
            "obj_xyz": [x, rng.normal(), rng.normal()],
        })
    out = tmp_path / "probe.hdf5"
    _write_coverage(str(out), "FakeTask", attempts)
    side = json.load(open(tmp_path / "probe.coverage.json"))
    s = side["summary"]
    assert s["attempts"] == 6 and s["successes"] == 3
    assert s["per_lang"]["A"] == {"rate": 0.75, "n": 4}
    assert s["per_lang"]["B"] == {"rate": 0.0, "n": 2}
    ratio = s["placement_std_ratio_xyz"]
    ok_x = np.std([a["obj_xyz"][0] for a in attempts if a["success"]])
    all_xs = np.std([a["obj_xyz"][0] for a in attempts])
    assert ratio[0] == pytest.approx(ok_x / all_xs, abs=1e-3)
    assert len(ratio) == 3


def test_coverage_sidecar_degenerate_no_ratio(tmp_path):
    """<2 successful placements: the std ratio is omitted, not NaN."""
    attempts = [{"success": False, "layout": 0, "style": 0, "lang": "A",
                 "obj_xyz": [0.0, 0.0, 0.0]} for _ in range(3)]
    out = tmp_path / "p.hdf5"
    _write_coverage(str(out), "FakeTask", attempts)
    side = json.load(open(tmp_path / "p.coverage.json"))
    assert "placement_std_ratio_xyz" not in side["summary"]
    assert side["summary"]["successes"] == 0
