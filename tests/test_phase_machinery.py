"""ScriptedPolicy phase machinery: budgets, retry jumps, aborts.

The recovery semantics (goto_on_budget/retries/abort_on_budget on
Phase, scripted.py) drive every expert's failure handling; pin them
with a fake env so regressions don't need MuJoCo rollouts to surface.
"""

import numpy as np

from lipvq_tpu.robocasa.sim.scripted import Phase, ScriptedPolicy


class _FakeEnv:
    pass


def _policy(phases):
    class P(ScriptedPolicy):
        def build_phases(self, env):
            return phases

    p = P.__new__(P)
    p.env = _FakeEnv()
    p.reset()
    return p


def test_budget_advances_to_next_phase():
    log = []
    phases = [
        Phase(lambda e: log.append("a") or np.zeros(12),
              lambda e: False, budget=3, name="a"),
        Phase(lambda e: log.append("b") or np.zeros(12),
              lambda e: False, budget=2, name="b"),
    ]
    p = _policy(phases)
    for _ in range(6):
        p.get_action()
    assert log == ["a", "a", "a", "b", "b"]
    assert p.finished


def test_done_advances_immediately_without_acting():
    log = []
    phases = [
        Phase(lambda e: log.append("a") or np.zeros(12),
              lambda e: True, budget=5, name="a"),
        Phase(lambda e: log.append("b") or np.zeros(12),
              lambda e: False, budget=1, name="b"),
    ]
    p = _policy(phases)
    p.get_action()
    assert log == ["b"]


def test_goto_on_budget_jumps_and_decrements_retries():
    runs = {"approach": 0}
    state = {"grasped": False}

    def approach_act(e):
        runs["approach"] += 1
        if runs["approach"] >= 3:  # succeeds on the 3rd re-entry
            state["grasped"] = True
        return np.zeros(12)

    phases = [
        Phase(approach_act, lambda e: False, budget=1, name="approach"),
        Phase(lambda e: np.zeros(12), lambda e: state["grasped"],
              budget=1, name="verify", goto_on_budget="approach",
              retries=3, abort_on_budget=True),
        Phase(lambda e: np.zeros(12), lambda e: False, budget=2,
              name="carry"),
    ]
    p = _policy(phases)
    for _ in range(12):
        if p.finished:
            break
        p.get_action()
    # approach ran 3x (1 initial + 2 retries), then verify passed and
    # the carry tail executed instead of aborting
    assert runs["approach"] == 3
    assert p.finished


def test_abort_on_budget_ends_episode_after_retries_exhausted():
    runs = {"approach": 0}
    phases = [
        Phase(lambda e: runs.__setitem__("approach", runs["approach"] + 1)
              or np.zeros(12),
              lambda e: False, budget=1, name="approach"),
        Phase(lambda e: np.zeros(12), lambda e: False, budget=1,
              name="verify", goto_on_budget="approach", retries=2,
              abort_on_budget=True),
        Phase(lambda e: (_ for _ in ()).throw(AssertionError("carry ran")),
              lambda e: False, budget=5, name="carry"),
    ]
    p = _policy(phases)
    for _ in range(20):
        if p.finished:
            break
        a = p.get_action()
        assert a.shape == (12,)
    assert p.finished
    assert runs["approach"] == 3  # initial + 2 retries


def test_budget_exit_without_recovery_just_advances():
    phases = [
        Phase(lambda e: np.zeros(12), lambda e: False, budget=2,
              name="verify", goto_on_budget="nonexistent", retries=2),
        Phase(lambda e: np.ones(12), lambda e: False, budget=1,
              name="tail"),
    ]
    p = _policy(phases)
    acts = [p.get_action() for _ in range(3)]
    # jump target missing -> falls through to plain advance
    assert (acts[2] == 1).all()
