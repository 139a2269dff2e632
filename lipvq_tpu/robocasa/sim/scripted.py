"""Privileged scripted policies for kitchen demo collection.

The reference collects demos by human teleop (robocasa
scripts/collect_demos.py keyboard/spacemouse, :481-491) and ships
MimicGen-generated datasets. Neither input device nor MimicGen is
available here, so this module provides *scripted experts*: waypoint
phase machines using privileged sim state (fixture joint values, object
poses) that solve the atomic tasks and emit the same 12-dim actions a
teleoperator would. `scripts/collect_demos.py --scripted` uses these to
generate kitchen training corpora end-to-end.

Design: each policy is a generator of phases; a phase produces actions
until its `done(env)` predicate or budget is exhausted. Actions go
through the same `env.step` contract as any policy (no state writes).
"""

from __future__ import annotations

import math

import numpy as np

from lipvq_tpu.robocasa.sim.fixtures import HingeCabinet


def _base_yaw(env):
    return env.get_joint_qpos("robot0_base_yaw")


def _world_to_armlocal(env, d_world):
    yaw = _base_yaw(env)
    c, s = math.cos(yaw), math.sin(yaw)
    R = np.array([[c, -s], [s, c]])
    return R.T @ np.asarray(d_world)[:2]


def arm_action(env, target, grip=-1.0, wrist_yaw=None, scale=0.05, gain=1.0):
    """Delta action moving the grip site toward a world target."""
    d = np.asarray(target) - env.eef_pos()
    dl = _world_to_armlocal(env, d)
    a = np.zeros(12)
    a[0] = np.clip(gain * dl[0] / scale, -1, 1)
    a[1] = np.clip(gain * dl[1] / scale, -1, 1)
    a[2] = np.clip(gain * d[2] / scale, -1, 1)
    if wrist_yaw is not None:
        err = wrist_yaw - env.get_joint_qpos("robot0_wrist_yaw")
        a[5] = np.clip(err / 0.15, -1, 1)
    a[6] = grip
    return a


def base_action(env, target_xy, target_yaw, grip=-1.0):
    """Base-mode action driving toward a world base pose. Inverts the
    mixing in RobotController.apply."""
    yaw = _base_yaw(env)
    base = env.data.body("robot0_base").xpos
    d = np.asarray(target_xy) - base[:2]
    c, s = math.cos(yaw), math.sin(yaw)
    # apply(): dx = -s*fwd + c*side ; dy = -c*fwd - s*side
    fwd = -s * d[0] - c * d[1]
    side = c * d[0] - s * d[1]
    dyaw = (target_yaw - yaw + math.pi) % (2 * math.pi) - math.pi
    a = np.zeros(12)
    a[7] = np.clip(fwd / 0.05, -1, 1)
    a[8] = np.clip(side / 0.05, -1, 1)
    a[9] = np.clip(dyaw / 0.10, -1, 1)
    a[6] = grip
    a[11] = 1.0
    return a


class Phase:
    def __init__(self, act_fn, done_fn, budget=120, name="",
                 goto_on_budget=None, retries=0, abort_on_budget=False,
                 abort_to=None):
        self.act = act_fn
        self.done = done_fn
        self.budget = budget
        self.name = name
        # failure recovery: exhausting the budget (done never fired)
        # jumps back to the phase named ``goto_on_budget`` up to
        # ``retries`` times instead of marching on — e.g. a verify-held
        # phase after lift re-enters the approach when the grasp missed
        self.goto_on_budget = goto_on_budget
        self.retries = retries
        # give up entirely once retries are exhausted (ends the episode
        # instead of walking an empty gripper through the carry tail)
        self.abort_on_budget = abort_on_budget
        # group-scoped abort: jump FORWARD to the named phase once
        # retries are exhausted, skipping the rest of this phase group
        # but leaving later groups alive — an episode-level abort on
        # object 1 of a two-object task forfeited object 2 as well
        # (traced on ArrangeVegetables: 4/10 failures stranded BOTH
        # vegetables after a single unrecoverable grasp)
        self.abort_to = abort_to


class ScriptedPolicy:
    """Phase-machine expert. Subclasses define build_phases(env)."""

    def __init__(self, env):
        # accept EnvKitchen adapters or raw Kitchen envs
        self.env = getattr(env, "env", env)
        self.reset()

    def reset(self):
        self._phases = None
        self._idx = 0
        self._t = 0
        self._retries_left = {}

    def build_phases(self, env):
        raise NotImplementedError

    def _jump(self, name):
        for i, p in enumerate(self._phases):
            if p.name == name:
                self._idx = i
                self._t = 0
                return True
        return False

    def get_action(self, obs=None):
        env = self.env
        if self._phases is None:
            self._phases = self.build_phases(env)
            self._retries_left = {
                i: p.retries for i, p in enumerate(self._phases) if p.retries
            }
        while self._idx < len(self._phases):
            ph = self._phases[self._idx]
            if ph.done(env):
                self._idx += 1
                self._t = 0
                continue
            if self._t >= ph.budget:
                cur = self._idx
                if (ph.goto_on_budget
                        and self._retries_left.get(cur, 0) > 0
                        and self._jump(ph.goto_on_budget)):
                    self._retries_left[cur] -= 1
                    continue
                if ph.abort_to and self._jump(ph.abort_to):
                    continue
                if ph.abort_on_budget:
                    self._idx = len(self._phases)
                    break
                self._idx += 1
                self._t = 0
                continue
            self._t += 1
            return ph.act(env)
        return np.zeros(12)  # hold

    @property
    def finished(self):
        return self._phases is not None and self._idx >= len(self._phases)


def _near_stand(e, stand_pos, tol):
    b = e.data.body("robot0_base").xpos[:2]
    return bool(np.linalg.norm(b - stand_pos[:2]) < tol)


def _near(env, target, tol):
    target = np.asarray(target, dtype=float)
    return lambda e: np.linalg.norm(e.eef_pos() - target) < tol


def _track(target_fn, grip=-1.0, wrist_yaw=None, gain=1.0):
    # wrist_yaw may be a callable of the env: re-resolved every step so
    # a grasp-orientation rule (e.g. basin-wall tangent) follows the
    # object's CURRENT pose instead of its reset pose
    return lambda e: arm_action(
        e, target_fn(e), grip=grip,
        wrist_yaw=(wrist_yaw(e) if callable(wrist_yaw) else wrist_yaw),
        gain=gain)


# ===================== Navigate =======================================


class NavigatePolicy(ScriptedPolicy):
    """Drive the base to the target pose (kitchen_navigate.py success:
    within 0.20m and cos(dyaw) >= 0.98)."""

    def build_phases(self, env):
        tgt_xy = env.target_pos[:2]
        tgt_yaw = env.target_ori[2]

        def done(e):
            base = e.data.body("robot0_base").xpos
            dyaw = (tgt_yaw - _base_yaw(e) + math.pi) % (2 * math.pi) - math.pi
            return (
                np.linalg.norm(tgt_xy - base[:2]) < 0.10
                and abs(dyaw) < 0.1
            )

        return [
            Phase(lambda e: base_action(e, tgt_xy, tgt_yaw), done, budget=400,
                  name="drive"),
        ]


# ===================== Drawer =========================================


class OpenDrawerPolicy(ScriptedPolicy):
    """Hook the drawer handle with rotated fingers and pull with the
    base until the slide fraction passes the success threshold."""

    def build_phases(self, env):
        dw = env.drawer
        front = np.array([math.sin(dw.yaw), -math.cos(dw.yaw), 0.0])

        def bar(e):
            return e.geom_xpos(dw.handle_name)

        def above(e):
            return bar(e) + np.array([0, 0, 0.15])

        def straddle(e):
            return bar(e) + np.array([0, 0, 0.005])

        wy = self._wrist_target(env, front)
        frac = lambda e: dw.get_door_state(e)["drawer"]
        return [
            Phase(_track(above, wrist_yaw=wy),
                  lambda e: np.linalg.norm(e.eef_pos() - above(e)) < 0.015
                  and abs(e.get_joint_qpos("robot0_wrist_yaw") - wy) < 0.1,
                  budget=200, name="above"),
            Phase(_track(straddle, wrist_yaw=wy),
                  lambda e: np.linalg.norm(e.eef_pos() - straddle(e)) < 0.012,
                  budget=120, name="descend"),
            # finger-bar contact starts at q~=0.027 (0.078-2q = bar
            # 0.024); require 2mm of servo preload so the clamp carries
            # load before the pull starts
            Phase(lambda e: arm_action(e, straddle(e), grip=1.0, wrist_yaw=wy),
                  lambda e: e.get_joint_qpos("robot0_leftfinger_joint") > 0.029,
                  budget=40, name="close"),
            # pull with the arm along the slide axis; when the drawer
            # box nears the robot base, back the base up (the open
            # drawer needs the standing spot)
            Phase(self._pull_act(front, bar, wy),
                  lambda e: frac(e) > 0.93, budget=400, name="pull"),
        ]

    @staticmethod
    def _pull_act(front, bar, wy):
        def act(e):
            base = e.data.body("robot0_base").xpos
            # arm-pull while the arm still has retraction room; once
            # the eef nears the base (arm_y local > -0.3, observable as
            # robot0_base_to_eef_pos), creep the base back with a small
            # hysteresis band. The switch is a pure function of the
            # observation — an earlier variant interleaved arm/base on
            # a hidden step counter (t % 3), which BC policies cannot
            # imitate from obs and which poisoned drawer corpora.
            eef_local_y = _world_to_armlocal(e, e.eef_pos() - base)[1]
            grab = bar(e) + front * 0.02 + np.array([0, 0, 0.005])
            if eef_local_y > -0.33:
                a = base_action(
                    e, base[:2] + front[:2] * 0.20, _base_yaw(e), grip=1.0
                )
                a[7:10] *= 0.2  # creep
                return a
            # quasi-static pull: fast yanks back-drive the finger servo
            # and the bar pops out of the grip
            return arm_action(e, grab, grip=1.0, wrist_yaw=wy, gain=0.35)

        return act

    @staticmethod
    def _wrist_target(env, front):
        """Wrist yaw so fingers close across the bar (along front)."""
        yaw = _base_yaw(env)
        # fingers close along palm x; palm x in world = (cos(yaw+wy), sin(yaw+wy))
        desired = math.atan2(front[1], front[0])
        wy = desired - yaw
        while wy > math.pi:
            wy -= 2 * math.pi
        while wy < -math.pi:
            wy += 2 * math.pi
        return wy


class CloseDrawerPolicy(ScriptedPolicy):
    """Push the drawer box front until it seats."""

    def build_phases(self, env):
        dw = env.drawer
        front = np.array([math.sin(dw.yaw), -math.cos(dw.yaw), 0.0])
        frac = lambda e: dw.get_door_state(e)["drawer"]

        def bar(e):
            return e.geom_xpos(dw.handle_name)

        def seated(e):
            return frac(e) < 0.03

        def stand_pt(e):
            return bar(e)[:2] + front[:2] * 0.62

        def stood(e):
            b = e.data.body("robot0_base").xpos[:2]
            # enough standoff that the eef can get IN FRONT of the bar:
            # a fully-open drawer protrudes ~0.35m and the default
            # vantage leaves the closed fingers behind the box front
            return (np.linalg.norm(b - stand_pt(e)) < 0.10
                    or float((b - bar(e)[:2]) @ front[:2]) > 0.50)

        return [
            # lift the peg above the bar BEFORE backing up: retreating
            # with the eef at bar height hooks the fingers on the far
            # side of the handle (firm contacts don't slip through),
            # leaving the whole approach wedged behind the drawer front
            Phase(lambda e: arm_action(
                      e, np.array([e.eef_pos()[0], e.eef_pos()[1],
                                   bar(e)[2] + 0.30]), grip=1.0, gain=0.6),
                  lambda e: e.eef_pos()[2] > bar(e)[2] + 0.24,
                  budget=50, name="tuck"),
            Phase(lambda e: base_action(e, stand_pt(e), _base_yaw(e),
                                        grip=1.0),
                  stood, budget=120, name="stand"),
            # come in above bar height, then drop onto the front point
            Phase(_track(lambda e: bar(e) + front * 0.12
                         + np.array([0, 0, 0.20]), grip=1.0),
                  lambda e: np.linalg.norm(
                      e.eef_pos() - (bar(e) + front * 0.12
                                     + np.array([0, 0, 0.20]))) < 0.03,
                  budget=120, name="high_front"),
            Phase(_track(lambda e: bar(e) + front * 0.12, grip=1.0),
                  lambda e: np.linalg.norm(e.eef_pos() - (bar(e) + front * 0.12)) < 0.02,
                  budget=200, name="front"),
            # track just past the (retreating) handle so the closed
            # fingers keep pressing the box front as it slides home
            Phase(lambda e: arm_action(e, bar(e) - front * 0.03, grip=1.0,
                                       gain=0.5),
                  seated, budget=460, name="push"),
        ]


# ===================== Buttons ========================================


class PressMicrowaveButtonPolicy(ScriptedPolicy):
    """Press start/stop, then retreat past the 0.15m 'far' check."""

    def build_phases(self, env):
        mw = env.microwave
        button = "start_button" if env.behavior == "turn_on" else "stop_button"
        front = np.array([math.sin(mw.yaw), -math.cos(mw.yaw), 0.0])
        bpos = lambda e: e.geom_xpos(f"{mw.name}_{button}")
        target_on = env.behavior == "turn_on"

        def pressed(e):
            return mw.get_state()["turned_on"] == target_on

        return [
            Phase(_track(lambda e: bpos(e) + front * 0.10, grip=1.0),
                  lambda e: np.linalg.norm(e.eef_pos() - (bpos(e) + front * 0.10)) < 0.02,
                  budget=240, name="approach"),
            Phase(_track(lambda e: bpos(e) - front * 0.02, grip=1.0, gain=0.5),
                  pressed, budget=120, name="press"),
            Phase(_track(lambda e: bpos(e) + front * 0.22, grip=1.0),
                  lambda e: mw.gripper_button_far(e, button=button),
                  budget=120, name="retreat"),
        ]


class PressCoffeeButtonPolicy(ScriptedPolicy):
    def build_phases(self, env):
        cm = env.coffee_machine
        front = np.array([math.sin(cm.yaw), -math.cos(cm.yaw), 0.0])
        bpos = lambda e: e.geom_xpos(f"{cm.name}_start_button")
        return [
            Phase(_track(lambda e: bpos(e) + front * 0.10, grip=1.0),
                  lambda e: np.linalg.norm(e.eef_pos() - (bpos(e) + front * 0.10)) < 0.02,
                  budget=240, name="approach"),
            Phase(_track(lambda e: bpos(e) - front * 0.02, grip=1.0, gain=0.5),
                  lambda e: cm.get_state()["turned_on"], budget=120, name="press"),
            Phase(_track(lambda e: bpos(e) + front * 0.22, grip=1.0),
                  lambda e: cm.gripper_button_far(e), budget=120, name="retreat"),
        ]


# ===================== Doors ==========================================


class OpenDoorPolicy(ScriptedPolicy):
    """Grasp the (vertical) handle bar and follow the opening arc."""

    behavior = "open"

    def build_phases(self, env):
        fx = env.door_fxtr
        phases = []
        handles = self._handles(fx)
        for joint, handle in handles:
            phases.extend(self._door_phases(env, fx, joint, handle))
        return phases

    @staticmethod
    def _handles(fx):
        if isinstance(fx, HingeCabinet):
            return [
                (f"{fx.name}_rightdoorjoint", f"{fx.name}_righthandle"),
                (f"{fx.name}_leftdoorjoint", f"{fx.name}_lefthandle"),
            ]
        if hasattr(fx, "handle_name"):
            joints = fx.door_joints() if hasattr(fx, "door_joints") else []
            return [(joints[0], fx.handle_name)]
        raise ValueError(f"no handle on {fx.name}")

    def _door_phases(self, env, fx, joint, handle, swing_budget=600):
        from lipvq_tpu.robocasa.sim.fixtures import DOOR_RANGE

        lo, hi = DOOR_RANGE
        target_frac = 0.95 if self.behavior == "open" else 0.02
        opening = self.behavior == "open"
        front = np.array([math.sin(fx.yaw), -math.cos(fx.yaw), 0.0])

        def frac(e):
            q = e.get_joint_qpos(joint)
            return (q - lo) / (hi - lo)

        def hpos(e):
            # work below the bar center so the palm clears the bar top
            return e.geom_xpos(handle) + np.array([0, 0, -0.045])

        def approach(e):
            return hpos(e) + front * 0.12

        def grasp_pt(e):
            return hpos(e)

        def door_normal(e):
            # outward panel normal, rotating with the door angle
            q = e.get_joint_qpos(joint)
            axis = e.data.xaxis[e.model.joint(joint).dofadr[0]]
            ang = q * np.sign(axis[2])
            c, s = math.cos(ang), math.sin(ang)
            return np.array(
                [c * front[0] - s * front[1], s * front[0] + c * front[1], 0.0]
            )

        def lateral(e):
            n = door_normal(e)
            return np.array([-n[1], n[0], 0.0])

        # The expert never grips the bar: a closed-finger "peg" slips
        # into the gap behind (open) / in front of (close) the handle
        # and pushes the bar along the hinge arc — pure normal-force
        # transmission. The push direction is computed from the hinge
        # axis (handle velocity for dq>0 is axis x r), not probed: the
        # old trend-probe started half the doors the WRONG way, and on
        # the microwave the wrong-way push wedged the peg against the
        # panel where the straight-line servo traps forever (observed:
        # eef frozen 7cm off the bar for 900+ steps, door never past
        # 0.24).
        jaxis = env.data.xaxis[env.model.joint(joint).dofadr[0]]
        sign0 = float(np.sign(jaxis[2]) or 1.0) * (1.0 if opening else -1.0)
        swing_state = {"sign": sign0, "stall": 0, "last": None, "first": None,
                       "locked": False, "restep": 0}

        def peg_pt(e, lateral_off=0.0, depth=0.027):
            # behind the bar for opening, in front for closing
            side = -1.0 if opening else 1.0
            return (
                hpos(e)
                + door_normal(e) * side * depth
                + lateral(e) * lateral_off
            )

        def arc_target(e):
            anchor = e.data.xanchor[e.model.joint(joint).dofadr[0]]
            r = peg_pt(e) - anchor
            f = frac(e)
            if swing_state["first"] is None:
                swing_state["first"] = f
            # once the door has clearly moved the intended way, the
            # handedness probe is settled: a later stall means the bar
            # left the arm workspace, so re-step the base instead of
            # flipping the push direction (flipping near full-open
            # oscillated the door at ~0.85, just under the 0.90
            # success threshold)
            if abs(f - swing_state["first"]) > 0.2:
                swing_state["locked"] = True
            if swing_state["last"] is not None:
                moved = (f - swing_state["last"]) * (1 if opening else -1)
                if moved < 5e-5:
                    swing_state["stall"] += 1
                else:
                    swing_state["stall"] = 0
                if swing_state["stall"] > 20:
                    if swing_state["locked"]:
                        swing_state["restep"] = 25
                    else:
                        swing_state["sign"] *= -1.0
                    swing_state["stall"] = 0
            swing_state["last"] = f
            dtheta = 0.06 * swing_state["sign"]
            ca, sa = math.cos(dtheta), math.sin(dtheta)
            rr = np.array([ca * r[0] - sa * r[1], sa * r[0] + ca * r[1], r[2]])
            return anchor + rr

        stall_done = {"best": 0.0, "age": 0}

        def done_frac(e):
            f = frac(e)
            if not opening:
                return f < target_frac
            if f > target_frac:
                return True
            # physically-stopped door (microwave doors hit a hard stop
            # at ~86% of DOOR_RANGE): once wide open and unmoving for
            # 100 steps, more swinging cannot help — exit with what the
            # workspace allows instead of burning the rest of the budget
            if f > stall_done["best"] + 0.005:
                stall_done["best"], stall_done["age"] = f, 0
            else:
                stall_done["age"] += 1
            return f > 0.80 and stall_done["age"] >= 100

        entry_off = 0.07  # slide in beside the bar, then center

        # stand toward the handle side: the door swings toward the
        # hinge, so this vantage keeps the bar inside the arm workspace
        # through the full 90-degree arc
        handle_side = float(np.sign(fx.to_local(env.geom_xpos(handle))[0]) or 1.0)
        stand_pos, stand_ori = env.compute_robot_base_placement_pose(
            fx, offset=(handle_side * 0.22, -0.12)
        )

        def stand_done(e):
            b = e.data.body("robot0_base").xpos
            return np.linalg.norm(b[:2] - stand_pos[:2]) < 0.08

        return [
            Phase(lambda e: base_action(e, stand_pos[:2], stand_ori[2], grip=1.0),
                  stand_done, budget=200, name="stand"),
            Phase(_track(lambda e: peg_pt(e, entry_off) + front * 0.12, grip=1.0),
                  lambda e: np.linalg.norm(
                      e.eef_pos() - (peg_pt(e, entry_off) + front * 0.12)) < 0.02,
                  budget=260, name=f"approach:{handle}"),
            Phase(_track(lambda e: peg_pt(e, entry_off), grip=1.0, gain=0.5),
                  lambda e: np.linalg.norm(e.eef_pos() - peg_pt(e, entry_off)) < 0.008,
                  budget=140, name="insert"),
            Phase(_track(lambda e: peg_pt(e), grip=1.0, gain=0.3),
                  lambda e: np.linalg.norm(e.eef_pos() - peg_pt(e)) < 0.008,
                  budget=140, name="center"),
            Phase(self._swing_or_step(arc_target, peg_pt, door_normal,
                                      swing_state),
                  done_frac, budget=swing_budget, name="swing"),
            Phase(lambda e: arm_action(e, e.eef_pos() + front * 0.10,
                                       grip=1.0, gain=0.6),
                  lambda e: False, budget=12, name="release"),
        ]


    @staticmethod
    def _swing_or_step(arc_target, peg_pt, door_normal, swing_state):
        """Swing via the arm; when the bar leaves the arm workspace
        (the door arc wraps around the robot) or the swing stalls after
        the handedness is settled, side-step the base to a fresh
        vantage in front of the moving bar."""

        def act(e):
            base = e.data.body("robot0_base").xpos
            local = _world_to_armlocal(e, e.eef_pos() - base)
            if swing_state["restep"] > 0:
                # stalled after the handedness settled: re-seat the peg
                # on the bar (approach from the push side, then center)
                swing_state["restep"] -= 1
                back = peg_pt(e) + door_normal(e) * 0.10
                tgt = back if swing_state["restep"] > 12 else peg_pt(e)
                return arm_action(e, tgt, grip=1.0, gain=0.5)
            if local[1] > 0.10 or abs(local[0]) > 0.65:
                stand = peg_pt(e) + door_normal(e) * 0.55
                return base_action(e, stand[:2], _base_yaw(e), grip=1.0)
            return arm_action(e, arc_target(e), grip=1.0, gain=0.6)

        return act


class CloseDoorPolicy(OpenDoorPolicy):
    """Close by pressing the panel face shut.

    The open-door peg-arc scheme is wrong for closing: retracting the
    peg after a stall hooks the bar from inside and drags the door back
    open (observed as a 1.0 <-> 0.5 oscillation). Closing needs no
    grasp at all — the palm pushes the panel face along its outward
    normal, which transmits maximal hinge torque and has nothing to
    hook. The push point sits between the handle and the hinge so the
    fingers clear the bar.
    """

    behavior = "close"

    def build_phases(self, env):
        # two passes over the doors: a door whose push stalled out its
        # budget in pass 1 gets retried in pass 2, while phases for
        # already-closed doors skip instantly (done fires before act)
        fx = env.door_fxtr
        phases = []
        for _round in range(2):
            for joint, handle in self._handles(fx):
                phases.extend(self._door_phases(env, fx, joint, handle))
        return phases

    def _door_phases(self, env, fx, joint, handle):
        from lipvq_tpu.robocasa.sim.fixtures import DOOR_RANGE

        lo, hi = DOOR_RANGE
        front = np.array([math.sin(fx.yaw), -math.cos(fx.yaw), 0.0])

        def frac(e):
            return (e.get_joint_qpos(joint) - lo) / (hi - lo)

        def hpos(e):
            return e.geom_xpos(handle) + np.array([0, 0, -0.045])

        def door_normal(e):
            q = e.get_joint_qpos(joint)
            axis = e.data.xaxis[e.model.joint(joint).dofadr[0]]
            ang = q * np.sign(axis[2])
            c, s = math.cos(ang), math.sin(ang)
            return np.array(
                [c * front[0] - s * front[1], s * front[0] + c * front[1], 0.0]
            )

        def push_pt(e, press=0.015):
            # panel-face point between handle and hinge, pressed
            # slightly through the surface so the servo keeps force on
            n = door_normal(e)
            h = hpos(e)
            anchor = e.data.xanchor[e.model.joint(joint).dofadr[0]]
            lat = anchor - h
            lat -= n * np.dot(n, lat)
            lat[2] = 0.0
            nl = np.linalg.norm(lat)
            if nl > 1e-6:
                lat = lat / nl
            # project the bar center back onto the panel plane
            p0 = h - n * np.dot(h - anchor, n)
            return p0 + lat * 0.10 - n * press

        def approach_pt(e, dist):
            # approach biased toward the fixture front (the aisle): a
            # pure-normal approach walks into the wall when a wide-open
            # door's outer face points at it, and puts the wrist onto
            # the panel where it deadlocks the push
            n = door_normal(e) + 1.6 * front
            n = n / max(np.linalg.norm(n), 1e-6)
            return push_pt(e, press=0.0) + n * dist

        def done(e):
            return frac(e) < 0.02

        push_state = {"last": None, "stall": 0, "creep": 0}

        def push(e):
            tgt = push_pt(e)
            f = frac(e)
            if push_state["last"] is not None and \
                    push_state["last"] - f < 5e-5:
                push_state["stall"] += 1
            else:
                push_state["stall"] = 0
            push_state["last"] = f
            if push_state["stall"] > 25:
                # no closing progress: the arm is at its lateral stop
                # (the gantry saturates at +-0.75 and the eef silently
                # freezes mid-push) — walk the base to a fresh vantage
                push_state["creep"] = 20
                push_state["stall"] = 0
            # re-position the base when the panel rotates out of reach
            # or a stall was just detected
            if (np.linalg.norm(e.eef_pos()[:2] - tgt[:2]) > 0.30
                    or push_state["creep"] > 0):
                push_state["creep"] = max(0, push_state["creep"] - 1)
                stand = push_pt(e, press=-0.5)
                return base_action(e, stand[:2], _base_yaw(e), grip=1.0)
            return arm_action(e, tgt, grip=1.0, gain=0.5)

        # stand facing the OPEN door's outer face (the fixture-frame
        # handle offset is wrong once the panel has swung out 90°)
        _, stand_ori = env.compute_robot_base_placement_pose(fx)
        stand_pos = push_pt(env, press=-0.55)

        def dfront(e):
            b = e.data.body("robot0_base").xpos[:2]
            return float(np.dot(b - stand_pos[:2], front[:2]))

        def stand_done(e):
            b = e.data.body("robot0_base").xpos
            return np.linalg.norm(b[:2] - stand_pos[:2]) < 0.08

        def tuck_tgt(e):
            b = e.data.body("robot0_base").xpos
            yaw = _base_yaw(e)
            fwd = np.array([math.sin(yaw), -math.cos(yaw), 0.0])
            return b + fwd * 0.30 + np.array([0.0, 0.0, 1.05 - b[2]])

        def tuck_done(e):
            return np.linalg.norm(e.eef_pos() - tuck_tgt(e)) < 0.06

        def out_act(e):
            # leg 1: back straight out into the aisle (driving the
            # direct diagonal hugs the counter fronts and wedges)
            b = e.data.body("robot0_base").xpos[:2]
            return base_action(e, b + front[:2] * 0.3, stand_ori[2], grip=1.0)

        def along_act(e):
            # leg 2: drive parallel to the run at aisle distance
            return base_action(e, stand_pos[:2] + front[:2] * 0.40,
                               stand_ori[2], grip=1.0)

        def along_done(e):
            b = e.data.body("robot0_base").xpos[:2]
            return np.linalg.norm(b - (stand_pos[:2] + front[:2] * 0.40)) < 0.12

        def D(fn):
            # every phase of this door's group skips once the door is
            # shut (lets the pass-2 retry groups no-op on closed doors)
            return lambda e: done(e) or fn(e)

        return [
            # tuck between doors so the diagonal move to the next
            # panel's outside doesn't sweep the arm through this one
            Phase(lambda e: arm_action(e, tuck_tgt(e), grip=1.0, gain=0.8),
                  D(tuck_done), budget=30, name="tuck"),
            # travel legs self-skip when the vantage is already close
            # (first door / single door): only a genuine relocation
            # needs the aisle route
            Phase(out_act,
                  D(lambda e: _near_stand(e, stand_pos, 0.50)
                    or dfront(e) > 0.35),
                  budget=35, name="out"),
            Phase(along_act,
                  D(lambda e: _near_stand(e, stand_pos, 0.50)
                    or along_done(e)),
                  budget=70, name="along"),
            Phase(lambda e: base_action(e, stand_pos[:2], stand_ori[2],
                                        grip=1.0),
                  D(stand_done), budget=70, name="stand"),
            # swing wide first so the palm clears the panel's free edge,
            # then come in along the outward normal
            Phase(_track(lambda e: approach_pt(e, 0.28), grip=1.0),
                  D(lambda e: np.linalg.norm(
                      e.eef_pos() - approach_pt(e, 0.28)) < 0.04),
                  budget=120, name=f"preapproach:{handle}"),
            Phase(_track(lambda e: approach_pt(e, 0.12), grip=1.0),
                  D(lambda e: np.linalg.norm(
                      e.eef_pos() - approach_pt(e, 0.12)) < 0.02),
                  budget=140, name=f"approach:{handle}"),
            Phase(push, done, budget=260, name="push"),
            Phase(lambda e: arm_action(e, e.eef_pos() + front * 0.10,
                                       grip=1.0, gain=0.6),
                  lambda e: False, budget=10, name="release"),
        ]


# ===================== Sink faucet ====================================


class SinkFaucetPolicy(ScriptedPolicy):
    """Sweep the handle lever with closed fingers (a 'peg' push) to
    reach/leave the water-on window (sink.py:67-110: on = 0.40 < q < pi)."""

    def build_phases(self, env):
        sink = env.sink
        joint = f"{sink.name}_handle_joint"
        target = 0.9 if env.behavior == "turn_on" else -0.1
        bar = f"{sink.name}_handlebar"

        def anchor(e):
            return e.data.xanchor[e.model.joint(joint).dofadr[0]]

        def _rot_about(e, point, dq):
            a = anchor(e)
            r = np.asarray(point) - a
            ca, sa = math.cos(dq), math.sin(dq)
            return a + np.array(
                [ca * r[0] - sa * r[1], sa * r[0] + ca * r[1], r[2]]
            )

        def bpos(e):
            return e.geom_xpos(bar)

        def sweep_dir(e):
            return 1.0 if target > e.get_joint_qpos(joint) else -1.0

        def contact_pt(e):
            # stand slightly behind the bar relative to the sweep, at
            # the same working radius as the push
            a = anchor(e)
            r = bpos(e) - a
            ang = math.atan2(r[1], r[0]) - 0.25 * sweep_dir(e)
            R = 0.12
            return a + np.array([R * math.cos(ang), R * math.sin(ang), 0.0])

        def push_pt(e):
            # track a point at fixed radius slightly AHEAD of the
            # lever's current angle: small lead keeps the peg pressed
            # against the bar without orbiting past its tip
            a = anchor(e)
            r = bpos(e) - a
            ang = math.atan2(r[1], r[0]) + 0.10 * sweep_dir(e)
            R = 0.12
            return a + np.array([R * math.cos(ang), R * math.sin(ang), 0.0])

        def done(e):
            return sink.get_handle_state(e)["water_on"] == (
                env.behavior == "turn_on"
            )

        return [
            Phase(_track(lambda e: contact_pt(e) + np.array([0, 0, 0.10]),
                         grip=1.0),
                  lambda e: np.linalg.norm(
                      e.eef_pos() - (contact_pt(e) + np.array([0, 0, 0.10]))) < 0.02,
                  budget=240, name="above"),
            Phase(_track(contact_pt, grip=1.0, gain=0.6),
                  lambda e: np.linalg.norm(e.eef_pos() - contact_pt(e)) < 0.015,
                  budget=100, name="lower"),
            Phase(lambda e: arm_action(e, push_pt(e), grip=1.0, gain=0.5),
                  done, budget=450, name="sweep"),
        ]


# ===================== Sink spout =====================================


class SinkSpoutPolicy(ScriptedPolicy):
    """Sweep the spout arm about its swivel until spout_ori matches the
    behavior (sink.py:96-107: left = (pi, 2pi - pi/6), right =
    (pi/6, pi) after mod-2pi)."""

    def build_phases(self, env):
        sink = env.sink
        joint = f"{sink.name}_spout_joint"
        arm = f"{sink.name}_spout_arm"
        # representative in-window targets (mod-2pi): left ~ -pi/2
        # (=3pi/2), right ~ +pi/2
        target = -math.pi / 2 if env.behavior == "left" else math.pi / 2

        def anchor(e):
            return e.data.xanchor[e.model.joint(joint).dofadr[0]]

        def apos(e):
            return e.geom_xpos(arm)

        def sweep_dir(e):
            return 1.0 if target > e.get_joint_qpos(joint) else -1.0

        def _at(e, dq, radius=0.17):
            a = anchor(e)
            r = apos(e) - a
            ang = math.atan2(r[1], r[0]) + dq
            return a + np.array(
                [radius * math.cos(ang), radius * math.sin(ang), r[2]]
            )

        def done(e):
            return sink.get_handle_state(e)["spout_ori"] == env.behavior

        return [
            Phase(_track(lambda e: _at(e, -0.3 * sweep_dir(e))
                         + np.array([0, 0, 0.12]), grip=1.0),
                  lambda e: np.linalg.norm(
                      e.eef_pos() - (_at(e, -0.3 * sweep_dir(e))
                                     + np.array([0, 0, 0.12]))) < 0.025,
                  budget=240, name="above"),
            Phase(_track(lambda e: _at(e, -0.3 * sweep_dir(e)), grip=1.0,
                         gain=0.5),
                  lambda e: np.linalg.norm(
                      e.eef_pos() - _at(e, -0.3 * sweep_dir(e))) < 0.02,
                  budget=120, name="lower"),
            Phase(lambda e: arm_action(e, _at(e, 0.06 * sweep_dir(e)),
                                       grip=1.0, gain=0.25),
                  done, budget=400, name="sweep"),
        ]


# ===================== Stove knobs ====================================


class StoveKnobPolicy(ScriptedPolicy):
    """Rotate the selected knob via its radial tab: the peg sweeps the
    tab along its circle in the vertical (x-z) plane about the knob
    axis (stove.py:109-160; on = 0.35 <= |q| <= 2pi - 0.35)."""

    def build_phases(self, env):
        stove = env.stove
        loc = env.knob
        joint = f"{stove.name}_knob_{loc}_joint"
        tab = f"{stove.name}_knobtab_{loc}"
        turn_on = env.behavior == "turn_on"
        target = 0.9 if turn_on else 0.0

        def knob_center(e):
            return e.geom_xpos(f"{stove.name}_knobcyl_{loc}")

        def tpos(e):
            return e.geom_xpos(tab)

        def sweep_dir(e):
            q = e.get_joint_qpos(joint)
            return 1.0 if target > q else -1.0

        def _at(e, dq, radius=0.075):
            c = knob_center(e)
            r = tpos(e) - c
            # rotation about the knob's local y axis: the tab circles
            # in the plane spanned by world x-z for a front-facing
            # stove; use the fixture frame to stay orientation-correct
            rl = stove.to_local(tpos(e)) - stove.to_local(knob_center(e))
            # +q about the knob's local +y axis moves the tab angle
            # theta -> theta - q in the local x-z plane
            ang = math.atan2(rl[2], rl[0]) - dq
            lp = np.array([radius * math.cos(ang), rl[1],
                           radius * math.sin(ang)])
            return stove.to_world(stove.to_local(knob_center(e)) + lp)

        def done(e):
            q = abs(e.get_joint_qpos(joint)) % (2 * math.pi)
            on = 0.35 <= q <= 2 * math.pi - 0.35
            return on if turn_on else not on

        return [
            Phase(_track(lambda e: _at(e, -0.45 * sweep_dir(e))
                         - np.array([math.sin(stove.yaw),
                                     -math.cos(stove.yaw), 0]) * -0.08,
                         grip=1.0),
                  lambda e: np.linalg.norm(
                      e.eef_pos() - (_at(e, -0.45 * sweep_dir(e))
                                     - np.array([math.sin(stove.yaw),
                                                 -math.cos(stove.yaw), 0])
                                     * -0.08)) < 0.02,
                  budget=240, name="approach"),
            Phase(_track(lambda e: _at(e, -0.45 * sweep_dir(e)), grip=1.0,
                         gain=0.5),
                  lambda e: np.linalg.norm(
                      e.eef_pos() - _at(e, -0.45 * sweep_dir(e))) < 0.015,
                  budget=120, name="engage"),
            Phase(lambda e: arm_action(e, _at(e, 0.30 * sweep_dir(e)),
                                       grip=1.0, gain=0.3),
                  done, budget=400, name="sweep"),
        ]


# ===================== PnP ============================================


def _out_low_pt(e, dest_fn, state):
    """Point in front of a high destination at the eef's current
    height (captured at phase entry)."""
    if state["z"] is None:
        state["z"] = float(e.eef_pos()[2])
    d = dest_fn(e)
    b = e.data.body("robot0_base").xpos
    v = b[:2] - d[:2]
    v = v / max(np.linalg.norm(v), 1e-6)
    return np.array([d[0] + v[0] * 0.38, d[1] + v[1] * 0.38, state["z"]])


def _shelf_stage_pt(e, dest_fn):
    """Level staging point in front of a high destination (toward the
    robot base), used before sliding into a shelf."""
    d = dest_fn(e)
    b = e.data.body("robot0_base").xpos
    v = b[:2] - d[:2]
    v = v / max(np.linalg.norm(v), 1e-6)
    return np.array([d[0] + v[0] * 0.25, d[1] + v[1] * 0.25, d[2] + 0.02])


def _exit_stage_pt(e, dest_fn):
    """Level exit point after a high (shelf) release: further out than
    the entry staging point (the open fingers need full clearance from
    the cabinet frame) and slightly above the shelf plane."""
    d = dest_fn(e)
    b = e.data.body("robot0_base").xpos
    v = b[:2] - d[:2]
    v = v / max(np.linalg.norm(v), 1e-6)
    return np.array([d[0] + v[0] * 0.38, d[1] + v[1] * 0.38, d[2] + 0.04])


def _reach_limit(z):
    """Horizontal arm-reach limit as a function of target height.

    Measured on this arm: counter height (z~0.98) reachable at 0.70m
    and 7cm short at 0.82m; pan-handle height (~1.1) works to ~0.9m;
    wall-cabinet height (z~1.7, torso raised) stalls ~0.29m short at
    0.73m out — the reach sphere narrows again above the shoulder."""
    if z < 1.05:
        return 0.74
    if z < 1.45:
        return 0.86
    return 0.58


def hollow_grasp(env, obj_name):
    """-> (grasp_pt_fn, wrist_yaw) for hollow/handle objects, or
    (None, None) for straddle-graspable solids.

    Bowls/pots are wider than the 8cm aperture; their 1cm rim wall
    (nearest the base, fingers closing radially) is the pinch feature.
    Pan/kettle ("mug") handles follow PnPStovePolicy's convention."""
    obj = env.objects[obj_name]
    shape = getattr(obj, "shape", None)
    if shape in ("pan", "mug"):
        def grasp_pt(e):
            return e.geom_xpos(f"{obj_name}_handle")

        hp = env.geom_xpos(f"{obj_name}_handle")
        o = env.object_pos(obj_name)
        u = hp[:2] - o[:2]
        u = u / max(np.linalg.norm(u), 1e-6)
        return grasp_pt, _wrist_yaw_for(env, np.array([-u[1], u[0]]))
    if shape in ("bowl", "pot"):
        base = env.data.body("robot0_base").xpos
        o = env.object_pos(obj_name)
        u = base[:2] - o[:2]
        u = u / max(np.linalg.norm(u), 1e-6)
        rim_r = obj.horizontal_radius

        def grasp_pt(e, _u=u, _r=rim_r):
            o = e.object_pos(obj_name)
            return np.array([o[0] + _u[0] * _r, o[1] + _u[1] * _r,
                             o[2] + e.objects[obj_name].height - 0.012])

        return grasp_pt, _wrist_yaw_for(env, u)
    return None, None


def _make_carry_act(carry_tgt, carry_gain):
    """Carry with base repositioning: a destination beyond the arm's
    reach envelope from the pick stance used to stall the carry for its
    whole 400-step budget (pick at A, place at B across the counter —
    the multi-stage composites do this constantly). Drive the base
    toward the destination first, then converge with the arm. When the
    base itself stalls (the ideal stand point is inside a counter —
    microwave/cabinet destinations), fall back to the arm and take the
    full-extension reach rather than base-stepping forever."""
    st = {"last": None, "still": 0}

    def act(e):
        d = carry_tgt(e)
        b = e.data.body("robot0_base").xpos
        v = b[:2] - d[:2]
        dist = float(np.linalg.norm(v))
        limit = _reach_limit(d[2])
        if st["last"] is not None and np.linalg.norm(
                b[:2] - st["last"]) < 0.01:
            st["still"] += 1
        else:
            st["still"] = 0
        st["last"] = np.array(b[:2])
        if dist > limit and st["still"] < 25:
            v = v / max(dist, 1e-6)
            return base_action(e, d[:2] + v * min(0.68, limit - 0.05),
                               _base_yaw(e), grip=1.0)
        return arm_action(e, d, grip=1.0, gain=carry_gain)

    return act


def _descend_done(at_obj, state):
    """Descend completes on convergence OR on a z-stall with xy
    aligned: firm fingertip<->support contact (robot.py priority=1)
    can stop the servo a few mm above an aggressive target — once xy
    is centered and z has stopped moving, the pinch is as low as
    physics allows and waiting the budget out just wastes 100+ steps.
    """

    def done(e):
        eef = e.eef_pos()
        tgt = at_obj(e)
        if np.linalg.norm(eef - tgt) < 0.015:
            return True
        z = float(eef[2])
        if state["z"] is not None and z > state["z"] - 0.001:
            state["stall"] += 1
        else:
            state["stall"] = 0
        state["z"] = z
        return (state["stall"] >= 12
                and np.linalg.norm(eef[:2] - tgt[:2]) < 0.015
                and z < tgt[2] + 0.04)

    return done


def pick_place_phases(obj_name, dest_fn, lift_dz=0.25, grasp_dz=-0.02,
                      carry_gain=0.3, name="", above_dz=0.18,
                      skip_torso_down=False, grasp_pt_fn=None,
                      wrist_yaw=None, withdraw_fn=None,
                      torso_down_mid=False, stage_fn=None,
                      reach_phase=False, verify_grasp=False,
                      carry_obj_offset=False, lower_dz=None,
                      place_verify_fn=None, place_retries=2,
                      pin_descend=False):
    """Reusable straddle-grasp pick-and-place phase list: approach
    above the object, descend, close until held, lift to a fixed
    height, carry over ``dest_fn(env)``, release, rise, back off
    (the gripper_obj_far predicates need >0.25m clearance).

    The recovery mechanisms are opt-in per task family — each altered
    the trajectory enough to break pinned seeds of tasks that never
    needed it:
    - ``reach_phase``: sidestep the base until the grasp point is
      inside the arm's ~0.92m reach envelope before approaching.
    - ``verify_grasp``: after the lift, confirm the object is held for
      a few steps; a missed pinch re-enters the approach (3 retries)
      instead of carrying an empty gripper, then aborts the episode.
    - ``carry_obj_offset``: aim the carry at dest + the eef->object
      offset captured at carry entry — for handle grasps (pan/kettle)
      the payload rides 8-10cm off the eef axis."""

    def opos(e):
        return e.object_pos(obj_name)

    def held(e):
        q = e.get_joint_qpos("robot0_leftfinger_joint")
        return 0.004 < q < 0.039 and (
            e.check_contact("robot0_leftfinger_geom", f"{obj_name}_")
            or e.check_contact("robot0_rightfinger_geom", f"{obj_name}_")
        )

    def pinched(e):
        # a real pinch: BOTH fingers touching, not a one-sided shove
        q = e.get_joint_qpos("robot0_leftfinger_joint")
        return 0.004 < q < 0.039 and (
            e.check_contact("robot0_leftfinger_geom", f"{obj_name}_")
            and e.check_contact("robot0_rightfinger_geom", f"{obj_name}_")
        )

    grasp_state = {"pinch": 0, "held": 0}

    def grasp_done(e):
        # first touch satisfies `held` before the servo has built any
        # clamping force — lifting then drops cylinders (cans slid out
        # of the RestockPantry grasp). Prefer a sustained two-finger
        # pinch; fall back to sustained one-finger hold for shapes
        # where the second contact never registers.
        grasp_state["pinch"] = grasp_state["pinch"] + 1 if pinched(e) else 0
        grasp_state["held"] = grasp_state["held"] + 1 if held(e) else 0
        return grasp_state["pinch"] >= 5 or grasp_state["held"] >= 12

    def above(e):
        # legacy straddle approach hovers over the object CENTER;
        # custom grasp points (rim/handle) hover over the grasp point
        base_pt = opos(e) if grasp_pt_fn is None else grasp_pt_fn(e)
        return base_pt + np.array([0, 0, above_dz])

    def at_obj(e):
        if grasp_pt_fn is not None:
            return grasp_pt_fn(e)
        obj = e.objects[obj_name]
        gz = max(obj.height * 0.5, 0.02) + grasp_dz
        # fingertip-clearance floor: the open fingertips reach ~5.5cm
        # below the eef frame, and finger<->support contacts are firm
        # (robot.py priority=1 solref) — a target that would press the
        # tips into the counter is unreachable: the z-servo stalls
        # there and never converges in xy either, so the pinch lands
        # off-center and shoves small objects away. Clamp the target
        # so the tips just graze the surface the object rests on.
        gz = max(gz, 0.057 - obj.height * 0.5)
        return opos(e) + np.array([0, 0, gz])

    lift_state = {"z": None}
    out_state = {"z": None, "wtgt": None}

    def _withdraw_tgt(e):
        if out_state["wtgt"] is None:
            out_state["wtgt"] = np.array(withdraw_fn(e))
        return out_state["wtgt"]
    carry_state = {"off": None}
    verify_state = {"z0": None}
    descend_state = {"z": None, "stall": 0, "tgt": None, "yaw": None}

    def _resolve_yaw(e):
        return wrist_yaw(e) if callable(wrist_yaw) else wrist_yaw

    def at_obj_eff(e):
        # pin_descend: freeze the grasp target at descend entry and go
        # straight down. Live tracking at finger depth turns a bumped
        # object into a pursuit — the descending cage plows it across
        # the counter/basin (observed on ArrangeVegetables: the
        # vegetable was shoved 16cm around the sink and twice flung
        # out of it). A clean vertical drop either cages it or misses,
        # and a miss re-enters the approach via the verify retry.
        if not pin_descend:
            return at_obj(e)
        if descend_state["tgt"] is None:
            tgt = np.array(at_obj(e))
            # floor-safe z: the open fingertips reach 5.5cm below the
            # eef — an aggressive target presses them into the support
            # and the z-servo BOUNCES (observed: eef oscillating ±5cm
            # while the cage skittered across the basin). On counters
            # the firm-contact stall absorbs this; a pinned vertical
            # drop must stop where the tips just graze the support
            # (= the object's resting origin for bottom-origin geoms).
            tgt[2] = max(tgt[2], float(opos(e)[2]) + 0.057)
            descend_state["tgt"] = tgt
            # freeze the wrist yaw with the target: re-resolving it
            # mid-descend rotates the fingers at payload depth and the
            # sweep bats the object away
            descend_state["yaw"] = _resolve_yaw(e)
        return descend_state["tgt"]

    def pin_yaw(e):
        if pin_descend and descend_state["tgt"] is not None:
            return descend_state["yaw"]
        return _resolve_yaw(e)

    def obj_settled(e):
        # pin_descend re-approaches after a dropped grasp: wait for the
        # payload to stop rolling first, or the pinned descend target
        # is captured from a pose the object has already left
        v = e.data.body(e.obj_body_id[obj_name]).cvel
        return float(np.linalg.norm(v[3:])) < 0.03

    lower_state = {"off": None, "z0": None, "ez0": None,
               "zlast": None, "stall": 0}

    def _lower_tgt(e):
        # aim the set-down so the PAYLOAD lands on the slot: capture
        # where the object actually hangs relative to the eef at lower
        # entry (after the carry has converged and swinging stopped)
        if lower_state["off"] is None:
            off = e.eef_pos()[:2] - opos(e)[:2]
            n = np.linalg.norm(off)
            if n > 0.16:  # payload already dropped: don't chase it
                off = off * (0.16 / n)
            lower_state["off"] = off
        t = np.array(_carry_tgt(e))
        t[0] += lower_state["off"][0]
        t[1] += lower_state["off"][1]
        return t

    def _touchdown_done(e):
        # stop lowering the moment the payload TOUCHES DOWN: lowering a
        # still-gripped long payload past contact pivots it out of the
        # pinch and it rolls off-slot (observed: the sweet potato
        # popped west off the cutting board on every set-down). The
        # payload has landed when its z stops falling while the eef is
        # still descending; also stop at full eef depth as before.
        z = float(opos(e)[2])
        ez = float(e.eef_pos()[2])
        if lower_state["z0"] is None:
            lower_state["z0"] = z
            lower_state["ez0"] = ez
            lower_state["zlast"] = z
            lower_state["stall"] = 0
            return False
        if z > lower_state["zlast"] - 0.0008:
            lower_state["stall"] += 1
        else:
            lower_state["stall"] = 0
        lower_state["zlast"] = z
        descended = lower_state["ez0"] - ez
        return ((lower_state["stall"] >= 3 and descended > 0.01)
                or ez < _carry_tgt(e)[2] - lower_dz + 0.02)

    def _carry_tgt(e):
        if grasp_pt_fn is None or not carry_obj_offset:
            return dest_fn(e)
        if carry_state["off"] is None:
            off = e.eef_pos()[:2] - opos(e)[:2]
            # a dropped payload would teleport the target; cap the
            # compensation at a plausible handle offset
            n = np.linalg.norm(off)
            if n > 0.16:
                off = off * (0.16 / n)
            carry_state["off"] = off
        d = dest_fn(e)
        return np.array([d[0] + carry_state["off"][0],
                         d[1] + carry_state["off"][1], d[2]])

    def lift_act(e):
        if lift_state["z"] is None:
            lift_state["z"] = float(e.eef_pos()[2]) + lift_dz
        t = np.array([e.eef_pos()[0], e.eef_pos()[1], lift_state["z"]])
        return arm_action(e, t, grip=1.0, gain=0.4)

    def lift_done(e):
        return (lift_state["z"] is not None
                and e.eef_pos()[2] > lift_state["z"] - 0.02)

    def torso_cmd(direction, grip):
        def act(e):
            a = np.zeros(12)
            a[11] = 1.0
            a[10] = direction
            a[6] = grip
            return a
        return act

    def torso_up_done(e):
        # the arm gantry tops out ~1.29m with the torso neutral; high
        # destinations (upper-cabinet shelves) need the torso lift
        need = dest_fn(e)[2] - 1.22
        return e.get_joint_qpos("robot0_torso_joint") >= min(0.43,
                                                            max(0.0, need))

    def torso_neutral_done(e):
        return e.get_joint_qpos("robot0_torso_joint") <= 0.02

    tag = name or obj_name

    def _pick_pt(e):
        return grasp_pt_fn(e) if grasp_pt_fn is not None else opos(e)

    def reach_ok(e):
        # height-dependent arm-reach envelope (_reach_limit) + a small
        # tolerance so an almost-in-range stance doesn't shuffle
        b = e.data.body("robot0_base").xpos
        p = _pick_pt(e)
        return np.linalg.norm(p[:2] - b[:2]) < _reach_limit(p[2]) + 0.04

    def reach_act(e):
        # re-entered on every grasp retry: clear per-attempt captures
        lift_state["z"] = None
        carry_state["off"] = None
        p = _pick_pt(e)
        b = e.data.body("robot0_base").xpos
        v = b[:2] - p[:2]
        v = v / max(np.linalg.norm(v), 1e-6)
        stand = min(0.70, _reach_limit(p[2]) - 0.04)
        return base_action(e, p[:2] + v * stand, _base_yaw(e))

    torso_down = [] if skip_torso_down else [
        # neutral torso first: a raised torso shifts the whole arm z
        # range up and counter-height objects fall out of reach
        Phase(torso_cmd(-1.0, grip=-1.0), torso_neutral_done,
              budget=50, name=f"torso_down:{tag}"),
    ]
    return torso_down + ([] if not reach_phase else [
        # sidestep the base until the grasp point is inside the arm's
        # reach envelope (no-op when it already is)
        Phase(reach_act, reach_ok, budget=140, name=f"reach:{tag}"),
    ]) + [
        # re-entered on every grasp retry: clear per-attempt captures
        Phase(lambda e: (lift_state.update(z=None),
                         carry_state.update(off=None),
                         out_state.update(wtgt=None),
                         lower_state.update(off=None, z0=None),
                         verify_state.update(z0=None),
                         descend_state.update(z=None, stall=0, tgt=None,
                                              yaw=None),
                         _track(above, grip=-1.0, wrist_yaw=wrist_yaw)(e)
                         )[-1],
              # pin mode: the open finger cage has ~7mm of lateral
              # clearance around round produce — center to 6mm while
              # still above (contact-free, so the servo CAN converge
              # that tight) before committing to the straight drop
              lambda e: np.linalg.norm(e.eef_pos() - above(e))
              < (0.006 if pin_descend else 0.02)
              and (not pin_descend or obj_settled(e)),
              budget=260, name=f"above:{tag}"),
        Phase(_track(at_obj_eff, grip=-1.0, gain=0.5, wrist_yaw=pin_yaw),
              _descend_done(at_obj_eff, descend_state),
              budget=140, name=f"descend:{tag}"),
        # capture the object's resting height while pinching — the
        # verify phase's "did it rise with the lift" test needs it
        Phase(lambda e: (verify_state.update(
                             z0=(verify_state["z0"] if verify_state["z0"]
                                 is not None else float(opos(e)[2]))),
                         arm_action(e, at_obj_eff(e), grip=1.0,
                                    wrist_yaw=pin_yaw(e)))[-1],
              grasp_done, budget=40, name=f"grasp:{tag}"),
        # fixed lift target captured at phase entry (a target that
        # tracks the held object chases itself upward)
        Phase(lift_act, lift_done, budget=80, name=f"lift:{tag}"),
    ] + ([] if not verify_grasp else [
        # verify the grasp actually took before carrying: a missed
        # pinch used to march the empty gripper through the whole
        # carry/release tail (observed in 6/20 stove-PnP seeds) —
        # instead jump back to the approach and re-grasp (grasp points
        # recompute from the object's current pose). The test is "did
        # the object rise with the lift": the finger-contact check both
        # false-negatives on thin payloads (sponge, pan handle compress
        # the fingers below the joint window) and false-positives when
        # a finger merely brushes the object while closing on air.
        Phase(lambda e: arm_action(e, e.eef_pos(), grip=1.0),
              lambda e: (
                  (float(opos(e)[2]) > verify_state["z0"]
                   + min(0.08, 0.5 * lift_dz)
                   if verify_state["z0"] is not None else held(e))
                  # rise alone false-positives when the closing fingers
                  # FLICK the object onto something higher (observed on
                  # a shoved broccoli): a held payload also touches a
                  # finger. No q-window here — thin payloads compress
                  # the fingers below it (the held() false-negative).
                  and (e.check_contact("robot0_leftfinger_geom",
                                       f"{obj_name}_")
                       or e.check_contact("robot0_rightfinger_geom",
                                          f"{obj_name}_"))),
              budget=4, name=f"verify:{tag}",
              goto_on_budget=(f"reach:{tag}" if reach_phase
                              else f"above:{tag}"), retries=3,
              abort_to=f"group_end:{tag}"),
    ]) + ([] if withdraw_fn is None else [
        # high-source tasks: pull straight out of the shelf/cavity at
        # constant height before any vertical travel. The target is
        # CAPTURED at phase entry: withdraw_fn computes from the held
        # object's live pose, and a held object moves with the eef — a
        # live target is a carrot on a stick that never converges
        # (observed: the eef chased its own payload to the 2.32m
        # gantry max, dragging the food diagonally out of the
        # microwave and burning the 150-step budget every episode).
        Phase(lambda e: arm_action(e, _withdraw_tgt(e), grip=1.0, gain=0.2),
              lambda e: np.linalg.norm(
                  e.eef_pos() - _withdraw_tgt(e)) < 0.05,
              budget=150, name=f"withdraw:{tag}"),
    ]) + ([] if not torso_down_mid else [
        Phase(torso_cmd(-1.0, grip=1.0), torso_neutral_done,
              budget=60, name=f"torso_down_mid:{tag}"),
    ]) + [
        # pull the held object clear of overhanging fixtures (open
        # cabinet doors) at constant height BEFORE the torso ascent —
        # ascending in place clips the door panel and knocks the
        # object out of the grip
        Phase(lambda e: arm_action(e, _out_low_pt(e, dest_fn, out_state),
                                   grip=1.0, gain=0.18),
              lambda e: dest_fn(e)[2] < 1.30 or np.linalg.norm(
                  e.eef_pos() - _out_low_pt(e, dest_fn, out_state)) < 0.05,
              budget=130, name=f"clear:{tag}"),
        Phase(torso_cmd(1.0, grip=1.0), torso_up_done,
              budget=60, name=f"torso_up:{tag}"),
        # high (shelf) destinations: reach shelf height OUTSIDE first,
        # then slide in level — a diagonal carry from below drives the
        # held object into the cabinet's bottom front edge and jams.
        # An explicit stage_fn supersedes this (two staging points in
        # different directions swing the payload loose).
        Phase(lambda e: arm_action(e, _shelf_stage_pt(e, dest_fn),
                                   grip=1.0, gain=0.4),
              lambda e: stage_fn is not None or dest_fn(e)[2] < 1.30
              or np.linalg.norm(
                  e.eef_pos() - _shelf_stage_pt(e, dest_fn)) < 0.05,
              budget=150, name=f"stage:{tag}"),
    ] + ([] if stage_fn is None else [
        # destination staging point (e.g. in front of an overhanging
        # dispenser head) reached before the final convergence
        Phase(lambda e: arm_action(e, stage_fn(e), grip=1.0, gain=0.25),
              lambda e: np.linalg.norm(e.eef_pos() - stage_fn(e)) < 0.04,
              budget=200, name=f"dest_stage:{tag}"),
    ]) + [
        # converge in 3D before releasing: dropping from height
        # bounces/rolls cylindrical objects off their receptacle.
        # ``dest_fn`` says where the OBJECT should land — handle grasps
        # (pan/kettle) hold the body 8-10cm off the eef axis, so aim
        # the eef at dest + the current eef->object offset (captured at
        # carry entry; recomputing it live chases a swinging payload)
        Phase(_make_carry_act(_carry_tgt, carry_gain),
              lambda e: np.linalg.norm(e.eef_pos() - _carry_tgt(e)) < 0.04,
              budget=400, name=f"carry:{tag}"),
    ] + ([] if lower_dz is None else [
        # opt-in: descend vertically at the slot before opening — lets
        # shelf placements slide in HIGH (clearing cans already on the
        # shelf) yet release from LOW (a >5cm drop tips a can over and
        # it rolls off-slot). The set-down aims the OBJECT over the
        # slot, not the eef: a tall payload gripped below its equator
        # hangs 10-15cm off the eef axis (observed: every sweet-potato
        # release landed ~15cm west of the board), so capture the
        # actual eef->object offset at lower entry and shift the
        # target by it.
        Phase(lambda e: arm_action(
                  e, _lower_tgt(e) - np.array([0, 0, lower_dz]),
                  grip=1.0, gain=0.3),
              _touchdown_done, budget=60, name=f"lower:{tag}"),
    ]) + [
        Phase(lambda e: arm_action(
                  e, (_lower_tgt(e) - np.array([0, 0, lower_dz])
                      if lower_dz is not None else _carry_tgt(e)),
                  grip=-1.0),
              lambda e: not held(e), budget=30, name=f"release:{tag}"),
        # high (shelf) releases drop the payload ~8-10cm: hold still
        # while it lands (the exit sweep one step after release clipped
        # the still-falling can and dragged it out of the cabinet)
        Phase(lambda e: arm_action(e, e.eef_pos(), grip=-1.0),
              lambda e: dest_fn(e)[2] < 1.30,
              budget=10, name=f"settle:{tag}"),
        # high (shelf) destinations exit the way they came in: rising
        # straight up INSIDE a cabinet traps the wrist against the
        # shelf above, and the subsequent straight-line servo to the
        # next target presses into the cabinet frame forever (observed
        # on RestockPantry: eef error froze at 0.375m for 260 steps).
        # Pull out level to the staging point first, then retreat.
        Phase(lambda e: arm_action(e, _exit_stage_pt(e, dest_fn),
                                   grip=-1.0, gain=0.35),
              lambda e: dest_fn(e)[2] < 1.30 or np.linalg.norm(
                  e.eef_pos() - _exit_stage_pt(e, dest_fn)) < 0.06,
              budget=120, name=f"exit:{tag}"),
        # success needs gripper_obj_far (> 0.25m): rise mostly straight
        # up (strong lateral motion can fling the just-released object).
        # Handle-grasp payloads get a slight base-ward drift — a
        # perfectly vertical rise can hook an open finger under a
        # kettle/pan handle and drag it along
        Phase(lambda e: arm_action(
            e, np.array([e.eef_pos()[0], e.eef_pos()[1],
                         opos(e)[2] + 0.4])
            + (0.10 if carry_obj_offset else 0.0)
            * (e.data.body("robot0_base").xpos - e.eef_pos())
            * np.array([1, 1, 0]), grip=-1.0, gain=0.5),
            lambda e: dest_fn(e)[2] >= 1.30
            or e.eef_pos()[2] > opos(e)[2] + 0.3,
            budget=60, name=f"rise:{tag}"),
        Phase(lambda e: arm_action(
            e, e.eef_pos() + 0.5 * (
                e.data.body("robot0_base").xpos - e.eef_pos())
            * np.array([1, 1, 0]), grip=-1.0, gain=0.5),
            lambda e: np.linalg.norm(e.eef_pos() - opos(e)) > 0.3,
            budget=60, name=f"retreat:{tag}"),
    ] + ([] if place_verify_fn is None else [
        # opt-in: confirm the payload actually rests at its
        # destination — a pinch that slips mid-carry completes the
        # whole carry/release tail with an empty gripper (observed:
        # a vegetable dropped into the sink on the way to the cutting
        # board). Re-enter the approach at the object's CURRENT pose.
        # jump all the way back to the torso reset: the place tail may
        # have raised the torso (high dests), which puts counter
        # objects out of reach if the retry skipped straight to the
        # approach
        Phase(lambda e: arm_action(e, e.eef_pos(), grip=-1.0),
              place_verify_fn, budget=8, name=f"place_verify:{tag}",
              goto_on_budget=(
                  f"torso_down:{tag}" if not skip_torso_down
                  else (f"reach:{tag}" if reach_phase else f"above:{tag}")),
              retries=place_retries),
    ]) + [
        # group-end label: target of the verify phase's group-scoped
        # abort. done=True, so it never consumes an env step.
        Phase(lambda e: np.zeros(12), lambda e: True, budget=1,
              name=f"group_end:{tag}"),
    ]


class PnPSinkPolicy(ScriptedPolicy):
    """Counter<->sink pick-and-place (kitchen_pnp.py:261-477)."""

    def build_phases(self, env):
        def dest(e):
            if type(e).__name__ == "PnPCounterToSink":
                fixture = e.fixture  # the sink
                c, _ = fixture.sample_region()
                return fixture.to_world(c + np.array([0, 0, 0.25]))
            # sink -> counter: drop zone near the sink on the counter
            counter = e.counter
            ref = counter.to_local(e.fixture.center)
            cx = float(np.clip(ref[0] + 0.45, -counter.width / 2 + 0.2,
                               counter.width / 2 - 0.2))
            return counter.to_world(
                np.array([cx, 0.0, counter.height + 0.22])
            )

        gp, wy = hollow_grasp(env, "obj")
        # counter->sink grasps off the counter: pin the descend (the
        # live-tracked cage plowed counter objects — one ended on the
        # floor 4/6 diagnosed seeds). Sink->counter (1.00 measured)
        # keeps the legacy stream.
        to_sink = type(env).__name__ == "PnPCounterToSink"
        return pick_place_phases("obj", dest, grasp_pt_fn=gp, wrist_yaw=wy,
                                 carry_obj_offset=gp is not None,
                                 pin_descend=to_sink)


# ===================== Multi-stage composites =========================


def _press_button_phases(machine_name, button, front, done, far_check):
    """Approach-press-retreat triple (shared with the button policies)."""
    def bpos(e):
        return e.geom_xpos(f"{machine_name}_{button}")

    # wrist neutral: composite tasks reach here with the wrist still
    # rotated from door phases, which lands the knuckles (not the
    # fingertips) on the button
    return [
        Phase(_track(lambda e: bpos(e) + front * 0.10, grip=1.0,
                     wrist_yaw=0.0),
              lambda e: np.linalg.norm(
                  e.eef_pos() - (bpos(e) + front * 0.10)) < 0.02
              and abs(e.get_joint_qpos("robot0_wrist_yaw")) < 0.15,
              budget=240, name=f"approach:{button}"),
        Phase(_track(lambda e: bpos(e) - front * 0.02, grip=1.0, gain=0.5,
                     wrist_yaw=0.0),
              done, budget=120, name=f"press:{button}"),
        Phase(_track(lambda e: bpos(e) + front * 0.22, grip=1.0),
              far_check, budget=120, name=f"clear:{button}"),
    ]


class MicrowaveThawingPolicy(ScriptedPolicy):
    """Pick the food into the (open) microwave, close the door is not
    required — press start (microwave_thawing.py:103-110: obj inside +
    turned_on + gripper far)."""

    def build_phases(self, env):
        mw = env.microwave
        front = np.array([math.sin(mw.yaw), -math.cos(mw.yaw), 0.0])

        # pre-insertion payload alignment: the slide-in tolerates ~2cm
        # of lateral grip offset (BASELINE.md round-3 expert matrix) and
        # the generic carry aims the EEF, not the payload, at the cavity
        # center. At the mouth, a settle pause waits for the payload to
        # stop swinging, captures the eef->obj offset, and both stage
        # and dest shift by it so the FOOD rides the cavity centerline.
        align = {"off": None, "last": None, "settle": 0}

        def _comp(p):
            if align["off"] is None:
                return p
            return p - np.array([align["off"][0], align["off"][1], 0.0])

        def dest(e):
            # eef height = cavity floor + 0.10: with bottom-origin
            # object geoms the grip rides AT the food's origin, so the
            # food's body sticks UP from the grip — at +0.21 the food's
            # top pressed the cavity ceiling and the slide-in jammed at
            # the opening (carry budget exhausted at the front lip)
            c, half = mw.interior_box()
            return _comp(mw.to_world(
                np.array([c[0], c[1], c[2] - half[2] + 0.10])
            ))

        def dest_stage(e):
            # level with the cavity floor, outside the opening: slide
            # in horizontally (a diagonal entry clips the front frame)
            return dest(e) + front * 0.42

        def _align_act(e):
            return arm_action(e, dest_stage(e), grip=1.0, gain=0.2)

        def _align_done(e):
            o = e.object_pos("obj")[:2]
            if align["last"] is not None and \
                    float(np.linalg.norm(o - align["last"])) < 0.002:
                align["settle"] += 1
            else:
                align["settle"] = 0
            align["last"] = o.copy()
            if align["settle"] >= 5:
                off = o - e.eef_pos()[:2]
                n = float(np.linalg.norm(off))
                if n > 0.12:  # dropped payload: don't teleport the target
                    off = off * (0.12 / n)
                align["off"] = off  # re-captured on grasp retries
                align["settle"] = 0
                return True
            return False

        # order matters: the door starts closed (microwave_thawing.py
        # _reset_internal) -> open it, place the food, shut it, press
        opener = OpenDoorPolicy.__new__(OpenDoorPolicy)
        opener.behavior = "open"
        # microwave doors creep under the firm-finger peg (observed:
        # q 0.8 -> 1.27 over the last 300 steps of a 600 budget, a few
        # percent short of the 0.95 target) — give the arc headroom
        phases = opener._door_phases(
            env, mw, f"{mw.name}_microjoint", f"{mw.name}_door_handle",
            swing_budget=1100,
        )
        # tuck the arm against the base before heading for the food:
        # any straight eef line from the door-handle end pose sweeps
        # the FOREARM through the fully-open panel and knocks it half
        # shut (observed: door 1.57 -> 0.77 during the traverse, then
        # the carry could never enter the blocked cavity). Tucked close
        # and low, the arm stays inside the base footprint while the
        # reach phase drives to the food.
        def tuck_pt(e):
            b = e.data.body("robot0_base").xpos
            yaw = _base_yaw(e)
            fwd = np.array([math.sin(yaw), -math.cos(yaw), 0.0])
            return b + fwd * 0.30 + np.array([0.0, 0.0, 1.0 - b[2]])

        phases += [
            # drop straight down below the panel's bottom edge first —
            # the swing leaves the eef on the far side of the open
            # panel at panel height, and any lateral move there swats
            # the door half shut
            Phase(lambda e: arm_action(
                      e, np.array([e.eef_pos()[0], e.eef_pos()[1], 1.0]),
                      gain=0.7),
                  lambda e: e.eef_pos()[2] < 1.10,
                  budget=50, name="drop_below_door"),
            Phase(_track(tuck_pt, gain=0.7),
                  lambda e: np.linalg.norm(e.eef_pos() - tuck_pt(e)) < 0.07,
                  budget=60, name="clear_door"),
        ]
        # the door phases leave the base at the microwave vantage; the
        # food spawns on a neighboring counter, often out of arm reach
        pp = pick_place_phases("obj", dest, carry_gain=0.25,
                               stage_fn=dest_stage,
                               reach_phase=True, verify_grasp=True)
        # insert the alignment pause right after the mouth staging point
        for i, ph in enumerate(pp):
            if ph.name.startswith("dest_stage:"):
                pp.insert(i + 1, Phase(_align_act, _align_done,
                                       budget=60, name="align_pause:obj"))
                break
        phases += pp
        closer = CloseDoorPolicy.__new__(CloseDoorPolicy)
        closer.behavior = "close"
        phases += closer._door_phases(
            env, mw, f"{mw.name}_microjoint", f"{mw.name}_door_handle"
        )
        # the microwave interlock needs the door fully seated
        # (update_state: door > 0.005 forces turned_on False) — the
        # generic close phases stop at ~0.05; press the panel shut
        def panel_pt(e):
            # push at the panel CENTER: pushing near the handle risks
            # re-hooking it on the way to the button
            pp = e.geom_xpos(f"{mw.name}_doorpanel")
            return pp - front * 0.04

        def backoff_pt(e):
            return e.geom_xpos(f"{mw.name}_doorpanel") + front * 0.20

        phases += [
            Phase(_track(panel_pt, grip=1.0, gain=0.5),
                  lambda e: mw.get_door_state(e)["door"] < 0.004,
                  budget=120, name="seat_door"),
            Phase(_track(backoff_pt, grip=1.0, gain=0.6),
                  lambda e: np.linalg.norm(e.eef_pos() - backoff_pt(e))
                  < 0.04,
                  budget=60, name="backoff_door"),
        ]
        # torso neutral before pressing: with the torso raised the
        # hand pitches and the wrist (not the fingertips) leads,
        # bottoming out on the control panel
        phases += [
            Phase(_torso_cmd(-1.0, grip=1.0),
                  lambda e: e.get_joint_qpos("robot0_torso_joint") <= 0.02,
                  budget=60, name="torso_down:press"),
        ]
        phases += _press_button_phases(
            mw.name, "start_button", front,
            lambda e: mw.get_state()["turned_on"],
            lambda e: mw.gripper_button_far(e, button="start_button"),
        )
        return phases


class PrepareCoffeePolicy(ScriptedPolicy):
    """Mug from the (opened) cabinet to the coffee machine platform,
    then press start (prepare_coffee.py:109-120)."""

    def build_phases(self, env):
        cm = env.coffee_machine
        front = np.array([math.sin(cm.yaw), -math.cos(cm.yaw), 0.0])

        def dest(e):
            # eef height so the held mug's bottom lands on the platform
            site = e.site_xpos(f"{cm.name}_dispenser")
            h = e.objects["obj"].height
            plat_z = cm.pos[2] + 0.02
            return np.array([site[0], site[1], plat_z + 0.6 * h + 0.02])

        def dest_stage(e):
            d = dest(e)
            return d + front * 0.22

        phases = pick_place_phases("obj", dest, carry_gain=0.2,
                                   above_dz=0.14, stage_fn=dest_stage)
        phases += _press_button_phases(
            cm.name, "start_button", front,
            lambda e: cm.get_state()["turned_on"],
            lambda e: cm.gripper_button_far(e),
        )
        return phases


class ArrangeVegetablesPolicy(ScriptedPolicy):
    """Both vegetables from the sink onto the cutting board
    (arrange_vegetables.py:96-110)."""

    def build_phases(self, env):
        def board_dest(dx, dy):
            # one slot per vegetable: aiming both at the board center
            # makes the second carry sweep through the first vegetable
            # and knock it off the board. Slots sit EAST of center:
            # the fingertips reach the board before a bottom-gripped
            # tall vegetable can be set down, so the release is always
            # a ~4cm drop that topples it and it rolls ~10cm west
            # (traced twice on seed 0) — the east bias keeps the roll
            # on the 32cm board. Y-separated slots were measured WORSE
            # (0.08 vs 0.17 over 12 seeds): the board's usable y extent
            # is narrower than x and rolls are along x, so y offsets
            # push releases off the edge — x slots stand despite the
            # second carry occasionally clipping slot 1
            def f(e):
                return e.object_pos("cutting_board") + np.array(
                    [dx, dy, 0.10]
                )
            return f

        from lipvq_tpu.robocasa.sim.kitchen import check_obj_in_receptacle

        def on_board(name):
            return lambda e: check_obj_in_receptacle(e, name,
                                                     "cutting_board")

        # vegetables rest against the basin walls: a default-yaw grasp
        # puts one finger INSIDE the wall and it jams open at ~74mm
        # aperture with no contact (observed via finger-q trace). Close
        # the fingers along the wall TANGENT so both finger paths stay
        # parallel to the nearest wall.
        sink_c = env.sink.to_world(env.sink.sample_region()[0])

        def veg_yaw(name):
            # live callable: re-resolved per step, so retries after a
            # shove re-orient to the vegetable's CURRENT wall side
            def f(e):
                u = e.object_pos(name)[:2] - sink_c[:2]
                n = float(np.linalg.norm(u))
                if n < 0.04:
                    return None
                u = u / n
                return _wrist_yaw_for(e, np.array([-u[1], u[0]]))
            return f

        phases = []
        for name, dx, dy in (("vegetable1", 0.03, 0.0),
                             ("vegetable2", 0.10, 0.0)):
            pp = pick_place_phases(name, board_dest(dx, dy),
                                        carry_gain=0.25,
                                        reach_phase=True, verify_grasp=True,
                                        place_verify_fn=on_board(name),
                                        wrist_yaw=veg_yaw(name),
                                        # pinch at the EQUATOR, not the
                                        # bottom tip: a tip-pinched tall
                                        # vegetable pokes UP out of the
                                        # grip, so every set-down is a
                                        # 4cm drop that topples it off
                                        # the board (roll direction
                                        # varies seed to seed); an
                                        # equator pinch hangs it below
                                        # the fingertips and the lower
                                        # phase can set it down with
                                        # zero drop
                                        grasp_dz=0.03,
                                        pin_descend=True,
                                        # release low: a 10cm drop
                                        # bounces produce off the
                                        # 1.6cm-thick board, and the
                                        # below-equator grip tilts tall
                                        # produce so it ROLLS on touch
                                        # -- set it down, don't drop it
                                        lower_dz=0.065,
                                        # release scatter is ~iid per
                                        # attempt (direction varies with
                                        # contact micro-state): extra
                                        # re-place attempts compound —
                                        # traced failures mostly ended
                                        # 10-25cm off the board with
                                        # retries exhausted
                                        place_retries=4)
            # NOTE a post-release "cage" (hold the open finger pair at
            # board level ~15 steps to block the topple-roll) was
            # measured in round 4: 0.25 vs 0.20 baseline over 12 seeds
            # (within noise) AND it broke the pinned reliable seed 5
            # (tests/test_scripted_experts.py) — reverted. The topple
            # scatter remains physics-bound (BASELINE.md).
            phases += pp
        return phases


class RestockPantryPolicy(ScriptedPolicy):
    """Both cans into the cabinet, next to the staged can
    (restock_pantry.py:148-160: inside + closer to cab_obj1 than
    cab_obj2)."""

    def build_phases(self, env):
        def dest(k):
            # one slot per can, offset from cab_obj1 TOWARD cab_obj2
            # (the cabinet center): cab_obj1 spawns against a side wall
            # (pos=(side, -0.3)), so slots "away" from cab_obj2 land on
            # or over the shelf edge — observed: the released can slid
            # off and hit the floor. The 2x-closer success ratio holds
            # for any slot within ~1/3 of the 0.66m can separation, so
            # 7cm / 15cm toward the center keeps both cans on the shelf
            # with margin (carry approaches along the cabinet depth, so
            # slot 2 never sweeps slot 1).
            def f(e):
                anchor_pos = e.object_pos("cab_obj1")
                other = e.object_pos("cab_obj2")
                sep = float(np.linalg.norm((other - anchor_pos)[:2]))
                toward = other - anchor_pos
                toward = toward / max(sep, 1e-6)
                toward[2] = 0.0
                # slots 10cm / 18cm toward the cabinet center: the
                # 2x-closer ratio needs < sep/3 (~0.22 for the usual
                # 0.66m can separation) from the anchor, 10cm keeps the
                # slide-in path clear of the anchor can, and the 8cm
                # slot gap exceeds a can diameter. A depth-offset slot
                # was tried instead and sits past the arm's shelf-height
                # reach envelope. Slide in high (+0.16, clearing shelf
                # cans) — the lower_dz phase descends at the slot before
                # releasing so the drop cannot tip the can.
                off = toward * (0.10 if k == 0 else 0.18)
                return anchor_pos + off + np.array([0, 0, 0.16])
            return f

        cab = env.cab
        front = np.array([math.sin(cab.yaw), -math.cos(cab.yaw)])

        def stance(obj_name):
            # face-on base stance before each pick: after the shelf
            # placement the base has drifted laterally, and the arm
            # servo pins ~3cm short of a laterally-offset counter
            # target (observed: eef error frozen at 0.031m for 260
            # steps on obj2) — realign squarely in front of the can
            def tgt(e):
                return e.object_pos(obj_name)[:2] + front * 0.62

            return Phase(
                lambda e: base_action(e, tgt(e), _base_yaw(e)),
                lambda e: np.linalg.norm(
                    e.data.body("robot0_base").xpos[:2] - tgt(e)) < 0.05,
                budget=100, name=f"stance:{obj_name}")

        from lipvq_tpu.robocasa.sim.kitchen import obj_inside_of

        def placed_ok(name):
            # mirror the task's per-can predicate: inside the cabinet
            # AND 2x closer to the staged can than to the decoy
            return lambda e: (obj_inside_of(e, name, e.cab)
                              and e._close_to_cab_cans(name))

        phases = []
        for i, name in enumerate(("obj1", "obj2")):
            phases.append(stance(name))
            phases += pick_place_phases(name, dest(i), carry_gain=0.25,
                                        reach_phase=True, verify_grasp=True,
                                        lower_dz=0.055,
                                        place_verify_fn=placed_ok(name))
        return phases


class PreSoakPanPolicy(ScriptedPolicy):
    """Sponge and pan into the sink, then turn the water on
    (pre_soak_pan.py:77-87)."""

    def build_phases(self, env):
        sink = env.sink

        def sink_dest(e):
            c, _ = sink.sample_region()
            return sink.to_world(c + np.array([0, 0, 0.25]))

        # grasp_dz=+0.005: pinch the flat sponge near its top edge —
        # the default bottom-sliver pinch slips out during the lift.
        # reach/verify recovery: the sponge can spawn on a counter
        # segment ~0.9m from the sink-parked base (observed: every
        # failing seed left it untouched at its spawn), so sidestep
        # into reach and re-grasp on a missed pinch
        def sponge_dest(e):
            # release the foam sponge LOW (+0.12 vs the pan's +0.25):
            # a 25cm drop bounces it off the basin walls onto the floor
            c, _ = sink.sample_region()
            return sink.to_world(c + np.array([0, 0, 0.12]))

        # grasp_dz=-0.005: pinch the foam sponge at its MIDDLE — a
        # top-edge pinch leaves a sliver of foam that squirts out of
        # the fingers (observed: the sponge popped upward as the
        # fingers closed, briefly passing the verify rise test)
        phases = pick_place_phases("obj2", sponge_dest, carry_gain=0.18,
                                   name="sponge", grasp_dz=-0.005,
                                   reach_phase=True, verify_grasp=True)
        # the pan is hollow (objects.py pan rim): grasp its handle bar
        # with the fingers closing across it
        def _u(e):
            hp = e.geom_xpos("obj1_handle")
            o = e.object_pos("obj1")
            v = hp[:2] - o[:2]
            return v / max(np.linalg.norm(v), 1e-6)

        def pan_grasp(e):
            # pinch the handle bar near its ROOT (3.5cm body-ward of
            # the bar center): an end pinch leaves a ~0.25 N*m gravity
            # torque that rotates the pan out of the fingertips during
            # the lift (observed: fingers closed to the bar, eef at the
            # handle within 1mm, payload slid out by lift+7 steps)
            hp = e.geom_xpos("obj1_handle")
            u = _u(e)
            return hp - np.array([u[0], u[1], 0.0]) * 0.035

        u = _u(env)
        perp = np.array([-u[1], u[0]])
        phases += pick_place_phases("obj1", sink_dest, carry_gain=0.2,
                                    name="pan", grasp_pt_fn=pan_grasp,
                                    wrist_yaw=_wrist_yaw_for(env, perp),
                                    above_dz=0.12,
                                    reach_phase=True, verify_grasp=True,
                                    carry_obj_offset=True)
        faucet = SinkFaucetPolicy.__new__(SinkFaucetPolicy)
        faucet.env = env

        class _B:  # behavior carrier for the faucet phase builder
            behavior = "turn_on"
            sink = env.sink

        env_proxy = env
        env_proxy_behavior = getattr(env, "behavior", None)
        del env_proxy, env_proxy_behavior
        env.behavior = "turn_on"
        phases += faucet.build_phases(env)
        return phases


class PnPCabinetPolicy(ScriptedPolicy):
    """Counter<->cabinet pick-and-place (kitchen_pnp.py:24-258): the
    cabinet doors start open; carry into/out of the shelf interior."""

    def build_phases(self, env):
        cab = env.cab
        to_cab = type(env).__name__ == "PnPCounterToCab"

        def cab_dest(e):
            c, half = cab.interior_box()
            # drop point just inside the shelf, slightly above the floor
            return cab.to_world(np.array([c[0], c[1] - half[1] * 0.2,
                                          c[2] - half[2] + 0.10]))

        def counter_dest(e):
            counter = e.counter
            ref = counter.to_local(cab.center)
            cx = float(np.clip(ref[0], -counter.width / 2 + 0.2,
                               counter.width / 2 - 0.2))
            return counter.to_world(
                np.array([cx, 0.05, counter.height + 0.18])
            )

        if to_cab:
            gp, wy = hollow_grasp(env, "obj")
            # counter-side grasp: pinned descend (see PnPSinkPolicy)
            return pick_place_phases("obj", cab_dest, carry_gain=0.25,
                                     grasp_pt_fn=gp, wrist_yaw=wy,
                                     carry_obj_offset=gp is not None,
                                     pin_descend=True)

        # source is the (high) cabinet shelf: torso up, grasp with a
        # shallow approach, withdraw straight out of the shelf front,
        # then lower the torso and carry to the counter
        front = np.array([math.sin(cab.yaw), -math.cos(cab.yaw), 0.0])

        def withdraw_pt(e):
            o = e.object_pos("obj")
            return np.array([o[0] + front[0] * 0.42,
                             o[1] + front[1] * 0.42,
                             max(o[2] + 0.05, 1.30)])

        pre = [Phase(_torso_cmd(1.0, grip=-1.0),
                     lambda e: e.get_joint_qpos("robot0_torso_joint") > 0.40,
                     budget=60, name="torso_up:cab_src")]
        return pre + pick_place_phases(
            "obj", counter_dest, above_dz=0.10, skip_torso_down=True,
            lift_dz=0.05, withdraw_fn=withdraw_pt, torso_down_mid=True,
            carry_gain=0.25,
        )


class PnPMicrowavePolicy(ScriptedPolicy):
    """Counter<->microwave pick-and-place (kitchen_pnp.py:480-726):
    microwave door starts open; the interior has ~20cm headroom so the
    approach hovers low and the exit withdraws level through the
    opening."""

    def build_phases(self, env):
        mw = env.fixture
        to_mw = type(env).__name__ == "PnPCounterToMicrowave"
        front = np.array([math.sin(mw.yaw), -math.cos(mw.yaw), 0.0])

        def mw_dest(e):
            c, half = mw.interior_box()
            return mw.to_world(np.array([c[0], c[1], c[2] - half[2] + 0.08]))

        def counter_dest(e):
            counter = e.counter
            ref = counter.to_local(mw.center)
            cx = float(np.clip(ref[0], -counter.width / 2 + 0.2,
                               counter.width / 2 - 0.2))
            return counter.to_world(
                np.array([cx, 0.05, counter.height + 0.18])
            )

        if to_mw:
            # pin_descend: the live-tracked descend plowed counter
            # objects (observed: an object flung 4m off the counter
            # during a grasp retry chase)
            return pick_place_phases("obj", mw_dest, carry_gain=0.25,
                                     reach_phase=True, verify_grasp=True,
                                     pin_descend=True)

        def withdraw_pt(e):
            o = e.object_pos("obj")
            return np.array([o[0] + front[0] * 0.45,
                             o[1] + front[1] * 0.45, o[2] + 0.04])

        pre = [Phase(_torso_cmd(1.0, grip=-1.0),
                     lambda e: e.get_joint_qpos("robot0_torso_joint") > 0.40,
                     budget=60, name="torso_up:mw_src")]
        return pre + pick_place_phases(
            "obj", counter_dest, above_dz=0.06, skip_torso_down=True,
            lift_dz=0.03, withdraw_fn=withdraw_pt, torso_down_mid=True,
            carry_gain=0.25,
        )


class PnPStovePolicy(ScriptedPolicy):
    """Counter<->stove cookware transfer (kitchen_pnp.py:729-908).
    Cookware is hollow (objects.py pan/pot rims): pinch the rim wall
    (pot) or the handle bar (pan) with the wrist rotated so the fingers
    close across it."""

    def build_phases(self, env):
        stove = env.fixture
        to_stove = type(env).__name__ == "PnPCounterToStove"
        obj = env.objects["obj"]
        base = env.data.body("robot0_base").xpos

        def stove_dest(e):
            # pull the drop point 40% toward the stove center: burner
            # samples near the rim let a tipping kettle roll off the
            # edge (success = stove contact, not burner alignment)
            c, _ = stove.sample_region(locs=["front_left"])
            c = np.array([c[0] * 0.6, c[1] * 0.6, c[2]])
            return stove.to_world(c + np.array([0, 0, 0.07]))

        def counter_dest(e):
            counter = e.counter
            ref = counter.to_local(stove.center)
            cx = float(np.clip(ref[0], -counter.width / 2 + 0.25,
                               counter.width / 2 - 0.25))
            return counter.to_world(
                np.array([cx, 0.0, counter.height + 0.15])
            )

        dest = stove_dest if to_stove else counter_dest

        if obj.shape in ("pan", "mug"):
            # handle grasp: pan handles are radial bars; kettle/teapot
            # ("mug" shape) bodies are SOLID cylinders wider than the
            # 8cm gripper aperture (observed: every kettle stove-PnP
            # seed failed the rim pinch with the right finger pressed on
            # the outer wall), so their stand-off side handle is the
            # only pinchable feature. Both close fingers ACROSS the
            # handle (perpendicular to the radial direction) — the
            # tangential approach also keeps both fingers clear of the
            # kettle body during the descent.
            def grasp_pt(e):
                return e.geom_xpos("obj_handle")

            def u_dir(e):
                hp = e.geom_xpos("obj_handle")
                o = e.object_pos("obj")
                v = hp[:2] - o[:2]
                return v / max(np.linalg.norm(v), 1e-6)

            u = u_dir(env)
            perp = np.array([-u[1], u[0]])
            wy = _wrist_yaw_for(env, perp)
        else:
            # rim wall nearest the robot base: fingers close along the
            # radial direction (across the 1cm wall)
            o = env.object_pos("obj")
            u = (base[:2] - o[:2])
            u = u / max(np.linalg.norm(u), 1e-6)
            rim_r = obj.horizontal_radius

            def grasp_pt(e, _u=u, _r=rim_r):
                o = e.object_pos("obj")
                return np.array([o[0] + _u[0] * _r, o[1] + _u[1] * _r,
                                 o[2] + e.objects["obj"].height - 0.015])

            wy = _wrist_yaw_for(env, u)

        return pick_place_phases(
            "obj", dest, grasp_pt_fn=grasp_pt, wrist_yaw=wy,
            above_dz=0.12, carry_gain=0.12, lift_dz=0.20,
            reach_phase=True, verify_grasp=True, carry_obj_offset=True,
        )


class CoffeeMugPolicy(ScriptedPolicy):
    """Mug to/from the coffee-machine dispenser platform
    (kitchen_coffee.py:5-105)."""

    def build_phases(self, env):
        cm = env.coffee_machine
        to_machine = env.behavior == "counter_to_machine"

        def machine_dest(e):
            # eef height so the held mug's bottom lands on the platform
            site = e.site_xpos(f"{cm.name}_dispenser")
            h = e.objects["obj"].height
            plat_z = cm.pos[2] + 0.02
            return np.array([site[0], site[1], plat_z + 0.6 * h + 0.02])

        def counter_dest(e):
            counter = e.counter
            ref = counter.to_local(cm.center)
            side = 1.0 if ref[0] <= 0 else -1.0
            cx = float(np.clip(ref[0] + side * 0.45,
                               -counter.width / 2 + 0.2,
                               counter.width / 2 - 0.2))
            return counter.to_world(
                np.array([cx, 0.0, counter.height + 0.15])
            )

        if to_machine:
            front = np.array([math.sin(cm.yaw), -math.cos(cm.yaw), 0.0])

            def dest_stage(e):
                return machine_dest(e) + front * 0.22

            return pick_place_phases("obj", machine_dest, carry_gain=0.2,
                                     above_dz=0.14, stage_fn=dest_stage)
        return pick_place_phases("obj", counter_dest, carry_gain=0.2,
                                 above_dz=0.14)


def _torso_cmd(direction, grip):
    def act(e):
        a = np.zeros(12)
        a[11] = 1.0
        a[10] = direction
        a[6] = grip
        return a
    return act


def _wrist_yaw_for(env, direction_xy):
    """Wrist yaw so the fingers close along ``direction_xy`` (same
    convention as OpenDrawerPolicy._wrist_target)."""
    yaw = _base_yaw(env)
    desired = math.atan2(direction_xy[1], direction_xy[0])
    wy = desired - yaw
    while wy > math.pi:
        wy -= 2 * math.pi
    while wy < -math.pi:
        wy += 2 * math.pi
    # the wrist joint range is symmetric; fingers closing along -d is
    # equivalent — fold into [-pi/2, pi/2] for reachability
    if wy > math.pi / 2:
        wy -= math.pi
    if wy < -math.pi / 2:
        wy += math.pi
    return wy


# ===================== registry ======================================

TASK_POLICIES = {
    "NavigateKitchen": NavigatePolicy,
    "OpenDrawer": OpenDrawerPolicy,
    "CloseDrawer": CloseDrawerPolicy,
    "TurnOnMicrowave": PressMicrowaveButtonPolicy,
    "TurnOffMicrowave": PressMicrowaveButtonPolicy,
    "CoffeePressButton": PressCoffeeButtonPolicy,
    "OpenSingleDoor": OpenDoorPolicy,
    "OpenDoubleDoor": OpenDoorPolicy,
    "CloseSingleDoor": CloseDoorPolicy,
    "CloseDoubleDoor": CloseDoorPolicy,
    "TurnOnSinkFaucet": SinkFaucetPolicy,
    "TurnOffSinkFaucet": SinkFaucetPolicy,
    "TurnSinkSpout": SinkSpoutPolicy,
    "TurnOnStove": StoveKnobPolicy,
    "TurnOffStove": StoveKnobPolicy,
    "PnPCounterToSink": PnPSinkPolicy,
    "PnPSinkToCounter": PnPSinkPolicy,
    "PnPCounterToCab": PnPCabinetPolicy,
    "PnPCabToCounter": PnPCabinetPolicy,
    "PnPCounterToMicrowave": PnPMicrowavePolicy,
    "PnPMicrowaveToCounter": PnPMicrowavePolicy,
    "PnPCounterToStove": PnPStovePolicy,
    "PnPStoveToCounter": PnPStovePolicy,
    "CoffeeSetupMug": CoffeeMugPolicy,
    "CoffeeServeMug": CoffeeMugPolicy,
    "MicrowaveThawing": MicrowaveThawingPolicy,
    "PrepareCoffee": PrepareCoffeePolicy,
    "ArrangeVegetables": ArrangeVegetablesPolicy,
    "RestockPantry": RestockPantryPolicy,
    "PreSoakPan": PreSoakPanPolicy,
}


def make_scripted_policy(task_name, env):
    if task_name not in TASK_POLICIES:
        raise KeyError(
            f"no scripted policy for {task_name!r}; available: "
            f"{sorted(TASK_POLICIES)}"
        )
    return TASK_POLICIES[task_name](env)
