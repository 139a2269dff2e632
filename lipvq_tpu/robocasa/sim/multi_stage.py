"""Multi-stage (composite) kitchen activities.

Counterpart of the 5 multi-stage tasks the paper's dataset registry
uses (reference robocasa/environments/kitchen/multi_stage/):

- ArrangeVegetables   chopping_food/arrange_vegetables.py
- MicrowaveThawing    defrosting_food/microwave_thawing.py
- RestockPantry       restocking_supplies/restock_pantry.py
- PreSoakPan          washing_dishes/pre_soak_pan.py
- PrepareCoffee       brewing/prepare_coffee.py

Each mirrors the reference's fixture refs, object cfgs, language and
multi-condition success predicates.
"""

from __future__ import annotations

import numpy as np

from lipvq_tpu.robocasa.sim.fixtures import FixtureType
from lipvq_tpu.robocasa.sim.kitchen import (
    Kitchen,
    check_obj_in_receptacle,
    gripper_obj_far,
    obj_inside_of,
)


class ArrangeVegetables(Kitchen):
    """Reference arrange_vegetables.py:4-110."""

    def _setup_kitchen_references(self):
        super()._setup_kitchen_references()
        self.sink = self.register_fixture_ref("sink", dict(id=FixtureType.SINK))
        self.counter = self.register_fixture_ref(
            "counter", dict(id=FixtureType.COUNTER, ref=self.sink, size=(0.45, 0.55))
        )
        self.init_robot_base_pos = self.sink

    def get_ep_meta(self):
        ep_meta = super().get_ep_meta()
        ep_meta["lang"] = (
            "Pick the vegetables from the sink and place them on the cutting board."
        )
        return ep_meta

    def _get_obj_cfgs(self):
        cfgs = [
            dict(
                name="cutting_board",
                obj_groups="cutting_board",
                graspable=False,
                placement=dict(
                    fixture=self.counter,
                    sample_region_kwargs=dict(
                        ref=self.sink, loc="left_right", top_size=(0.45, 0.55)
                    ),
                    size=(0.35, 0.45),
                    pos=("ref", -1.0),
                ),
            ),
            dict(
                name="knife",
                obj_groups="knife",
                graspable=False,
                placement=dict(
                    fixture=self.counter,
                    sample_region_kwargs=dict(
                        ref=self.sink, loc="left_right", top_size=(0.45, 0.55)
                    ),
                    size=(0.45, 0.45),
                    pos=("ref", -1.0),
                    offset=(0.0, 0.05),
                ),
            ),
            dict(
                name="vegetable1",
                obj_groups="vegetable",
                graspable=True,
                placement=dict(fixture=self.sink, size=(0.30, 0.20), pos=(-1.0, 1.0)),
            ),
            dict(
                name="vegetable2",
                obj_groups="vegetable",
                graspable=True,
                placement=dict(fixture=self.sink, size=(0.30, 0.20), pos=(1.0, 1.0)),
            ),
        ]
        return cfgs

    def _check_success(self):
        """Reference arrange_vegetables.py:96-110."""
        v1 = check_obj_in_receptacle(self, "vegetable1", "cutting_board")
        v2 = check_obj_in_receptacle(self, "vegetable2", "cutting_board")
        return v1 and v2 and gripper_obj_far(self, obj_name="cutting_board")


class MicrowaveThawing(Kitchen):
    """Reference microwave_thawing.py:4-110."""

    EXCLUDE_LAYOUTS = [8]  # reference: microwave far from counters

    def _setup_kitchen_references(self):
        super()._setup_kitchen_references()
        self.microwave = self.register_fixture_ref(
            "microwave", dict(id=FixtureType.MICROWAVE)
        )
        self.counter = self.register_fixture_ref(
            "counter", dict(id=FixtureType.COUNTER, ref=self.microwave)
        )
        self.distr_counter = self.register_fixture_ref(
            "distractor_counter", dict(id=FixtureType.COUNTER, ref=self.microwave)
        )
        self.init_robot_base_pos = self.microwave

    def _reset_internal(self):
        super()._reset_internal()
        self.microwave.set_door_state(min=0, max=0, env=self, rng=self.rng)

    def get_ep_meta(self):
        ep_meta = super().get_ep_meta()
        ep_meta["lang"] = (
            f"Pick the {self.get_obj_lang()} from the counter and place it "
            "in the microwave. Then turn on the microwave."
        )
        return ep_meta

    def _get_obj_cfgs(self):
        return [
            dict(
                name="obj",
                obj_groups="food",
                graspable=True,
                microwavable=True,
                freezable=True,
                placement=dict(
                    fixture=self.counter,
                    sample_region_kwargs=dict(ref=self.microwave),
                    size=(0.30, 0.30),
                    pos=("ref", -1.0),
                ),
            ),
            dict(
                name="container",
                obj_groups="plate",
                placement=dict(
                    fixture=self.microwave,
                    size=(0.05, 0.05),
                    ensure_object_boundary_in_range=False,
                ),
            ),
            dict(
                name="distr_counter",
                obj_groups="all",
                placement=dict(
                    fixture=self.distr_counter,
                    sample_region_kwargs=dict(ref=self.microwave),
                    size=(0.50, 0.20),
                    pos=(0, 1.0),
                ),
            ),
        ]

    def _check_success(self):
        """Reference microwave_thawing.py:103-110."""
        obj_in = obj_inside_of(self, "obj", self.microwave)
        button = self.microwave.get_state()["turned_on"]
        return obj_in and button and gripper_obj_far(self)


class RestockPantry(Kitchen):
    """Reference restock_pantry.py:4-160."""

    def _setup_kitchen_references(self):
        super()._setup_kitchen_references()
        self.cab = self.register_fixture_ref(
            "cab", dict(id=FixtureType.DOOR_TOP_HINGE_DOUBLE)
        )
        self.counter = self.register_fixture_ref(
            "counter", dict(id=FixtureType.COUNTER, ref=self.cab)
        )
        self.init_robot_base_pos = self.cab

    def get_ep_meta(self):
        ep_meta = super().get_ep_meta()
        ep_meta["lang"] = (
            "Pick the cans from the counter and place them in their "
            "designated side in the cabinet."
        )
        return ep_meta

    def _reset_internal(self):
        super()._reset_internal()
        self.cab.set_door_state(min=1.0, max=1.0, env=self, rng=self.rng)

    def _get_obj_cfgs(self):
        side = int(self.rng.choice([-1, 1]))
        return [
            dict(
                name="obj1",
                obj_groups="canned_food",
                graspable=True,
                placement=dict(
                    fixture=self.counter,
                    sample_region_kwargs=dict(ref=self.cab),
                    size=(0.50, 0.30),
                    pos=("ref", -1),
                ),
            ),
            dict(
                name="obj2",
                obj_groups="canned_food",
                graspable=True,
                placement=dict(
                    fixture=self.counter,
                    sample_region_kwargs=dict(ref=self.cab),
                    size=(0.50, 0.30),
                    pos=("ref", -1),
                ),
            ),
            dict(
                name="cab_obj1",
                obj_groups="canned_food",
                graspable=True,
                placement=dict(fixture=self.cab, size=(0.2, 0.30), pos=(side, -0.3)),
            ),
            dict(
                name="cab_obj2",
                obj_groups="all",
                exclude_obj_groups="canned_food",
                graspable=True,
                placement=dict(fixture=self.cab, size=(0.2, 0.30), pos=(side * -1, 0.3)),
            ),
            dict(
                name="distr_counter",
                obj_groups="all",
                placement=dict(
                    fixture=self.counter,
                    sample_region_kwargs=dict(ref=self.cab),
                    size=(1.0, 0.30),
                    pos=(0.0, 1.0),
                    offset=(0.0, -0.05),
                ),
            ),
        ]

    def _close_to_cab_cans(self, obj_name, ratio=2):
        """Reference restock_pantry.py:121-146."""
        obj_pos = self.object_pos(obj_name)
        can_pos = self.object_pos("cab_obj1")
        other_pos = self.object_pos("cab_obj2")
        can_dist = np.linalg.norm(obj_pos - can_pos)
        other_dist = np.linalg.norm(other_pos - obj_pos)
        return can_dist * ratio < other_dist

    def _check_success(self):
        """Reference restock_pantry.py:148-160."""
        in1 = obj_inside_of(self, "obj1", self.cab)
        in2 = obj_inside_of(self, "obj2", self.cab)
        cans_close = self._close_to_cab_cans("obj1") and self._close_to_cab_cans("obj2")
        far = gripper_obj_far(self, "obj1") and gripper_obj_far(self, "obj2")
        return in1 and in2 and cans_close and far


class PreSoakPan(Kitchen):
    """Reference pre_soak_pan.py:4-87."""

    def _setup_kitchen_references(self):
        super()._setup_kitchen_references()
        self.sink = self.register_fixture_ref("sink", dict(id=FixtureType.SINK))
        self.counter = self.register_fixture_ref(
            "counter", dict(id=FixtureType.COUNTER, ref=self.sink, size=(0.6, 0.4))
        )
        self.init_robot_base_pos = self.sink

    def get_ep_meta(self):
        ep_meta = super().get_ep_meta()
        ep_meta["lang"] = (
            "Pick the pan and sponge and place them into the sink. "
            "Then turn on the water."
        )
        return ep_meta

    def _reset_internal(self):
        super()._reset_internal()
        self.sink.set_handle_state(mode="off", env=self, rng=self.rng)

    def _get_obj_cfgs(self):
        return [
            dict(
                name="obj1",
                obj_groups="pan",
                graspable=True,
                washable=True,
                max_size=(0.35, 0.45, None),
                placement=dict(
                    fixture=self.counter,
                    sample_region_kwargs=dict(
                        ref=self.sink, loc="left_right", top_size=(0.6, 0.4)
                    ),
                    size=(0.35, 0.55),
                    pos=("ref", -1.0),
                ),
            ),
            dict(
                name="obj2",
                obj_groups="sponge",
                placement=dict(
                    fixture=self.counter,
                    sample_region_kwargs=dict(ref=self.sink, loc="left_right"),
                    size=(0.3, 0.3),
                    pos=("ref", -1.0),
                ),
            ),
        ]

    def _check_success(self):
        """Reference pre_soak_pan.py:77-87."""
        water_on = self.sink.get_handle_state(env=self)["water_on"]
        pan_in = obj_inside_of(self, "obj1", self.sink)
        sponge_in = obj_inside_of(self, "obj2", self.sink)
        return water_on and pan_in and sponge_in and gripper_obj_far(self, "obj1")


class PrepareCoffee(Kitchen):
    """Reference prepare_coffee.py:4-120."""

    def __init__(self, cab_id=FixtureType.CABINET_TOP, *args, **kwargs):
        self.cab_id = cab_id
        super().__init__(*args, **kwargs)

    def _setup_kitchen_references(self):
        super()._setup_kitchen_references()
        self.coffee_machine = self.register_fixture_ref(
            "coffee_machine", dict(id="coffee_machine")
        )
        self.cab = self.register_fixture_ref(
            "cab", dict(id=self.cab_id, ref=self.coffee_machine)
        )
        self.init_robot_base_pos = self.cab

    def get_ep_meta(self):
        ep_meta = super().get_ep_meta()
        ep_meta["lang"] = (
            f"Pick the {self.get_obj_lang()} from the cabinet, place it "
            "under the coffee machine dispenser, and press the start button."
        )
        return ep_meta

    def _get_obj_cfgs(self):
        return [
            dict(
                name="obj",
                obj_groups="mug",
                placement=dict(fixture=self.cab, size=(0.30, 0.20), pos=(0, -1.0)),
            ),
            dict(
                name="distr_cab",
                obj_groups="all",
                placement=dict(
                    fixture=self.cab, size=(1.0, 0.20), pos=(0.0, 1.0), offset=(0.0, 0.0)
                ),
            ),
        ]

    def _reset_internal(self):
        super()._reset_internal()
        self.cab.set_door_state(min=0.90, max=1.0, env=self, rng=self.rng)

    def _check_success(self):
        """Reference prepare_coffee.py:109-120."""
        far = gripper_obj_far(self)
        contact = self.coffee_machine.check_receptacle_placement_for_pouring(self, "obj")
        button_far = self.coffee_machine.gripper_button_far(self)
        return contact and far and self.coffee_machine._turned_on and button_far
