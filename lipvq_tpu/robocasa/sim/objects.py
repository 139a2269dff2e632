"""Procedural kitchen objects (reference robocasa/models/objects/).

The reference samples MJCF mesh assets from a 2,114-LoC registry
(kitchen_objects.py) with per-category attributes (graspable,
washable, microwavable, cookware, ...). The asset pack is unavailable
here, so objects are primitive-geom procedural bodies carrying the
same category/attribute surface: ``sample_kitchen_object`` filters by
group + attribute exactly like reference
kitchen_object_utils.sample_kitchen_object.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

try:
    import mujoco
except Exception:  # pragma: no cover
    mujoco = None


@dataclass
class KitchenObject:
    """One placeable object spec (reference objects.py MJCFObject)."""

    name: str  # scene-unique instance name (set at placement time)
    category: str  # e.g. "apple"
    groups: tuple  # e.g. ("vegetable", "food")
    horizontal_radius: float
    height: float
    rgba: tuple
    graspable: bool = False
    washable: bool = False
    microwavable: bool = False
    heatable: bool = False
    freezable: bool = False
    cookware: bool = False
    container: bool = False
    shape: str = "box"  # box | sphere | cylinder | mug | pan | plate | knife | board
    scale: float = 1.0

    def build(self, spec, pos, yaw=0.0):
        """Add a free body for this object to the MjSpec."""
        body = spec.worldbody.add_body(name=self.name, pos=list(pos))
        body.quat = [math.cos(yaw / 2), 0, 0, math.sin(yaw / 2)]
        fj = body.add_joint(name=f"{self.name}_freejoint", type=mujoco.mjtJoint.mjJNT_FREE)
        del fj
        r, h = self.horizontal_radius, self.height
        rgba = list(self.rgba)

        def box(nm, size, p, rg=None):
            g = body.add_geom(
                name=nm, type=mujoco.mjtGeom.mjGEOM_BOX, size=size, pos=p, rgba=rg or rgba
            )
            g.density = 300.0
            return g

        def cyl(nm, rad, hh, p, rg=None):
            g = body.add_geom(
                name=nm, type=mujoco.mjtGeom.mjGEOM_CYLINDER, size=[rad, hh, 0], pos=p,
                rgba=rg or rgba,
            )
            g.density = 300.0
            return g

        if self.shape == "sphere":
            g = body.add_geom(
                name=f"{self.name}_g0", type=mujoco.mjtGeom.mjGEOM_SPHERE,
                size=[r, 0, 0], pos=[0, 0, r], rgba=rgba,
            )
            g.density = 300.0
        elif self.shape == "cylinder":
            cyl(f"{self.name}_g0", r, h / 2, [0, 0, h / 2])
        elif self.shape == "mug":
            cyl(f"{self.name}_g0", r - 0.008, h / 2, [0, 0, h / 2])
            box(f"{self.name}_handle", [0.006, 0.018, h / 3], [r + 0.004, 0, h / 2])
        elif self.shape == "plate":
            cyl(f"{self.name}_g0", r, h / 2, [0, 0, h / 2])
        elif self.shape == "pan":
            cyl(f"{self.name}_g0", r, h / 2, [0, 0, h / 2])
            box(f"{self.name}_handle", [0.075, 0.012, 0.008], [r + 0.07, 0, h - 0.008])
        elif self.shape == "knife":
            box(f"{self.name}_blade", [0.07, 0.012, 0.004], [0.03, 0, 0.006],
                [0.75, 0.75, 0.78, 1])
            box(f"{self.name}_grip", [0.04, 0.01, 0.008], [-0.07, 0, 0.008])
        elif self.shape == "board":
            box(f"{self.name}_g0", [r, r * 0.7, h / 2], [0, 0, h / 2])
        else:  # box
            box(f"{self.name}_g0", [r, r, h / 2], [0, 0, h / 2])
        return body


# catalog: category -> prototype (reference kitchen_objects.py OBJ_CATEGORIES)
_CATALOG = {
    "apple": dict(groups=("fruit", "food"), shape="sphere", hr=0.035, h=0.07,
                  rgba=(0.8, 0.15, 0.1, 1), graspable=True, washable=True,
                  microwavable=True, freezable=True),
    "orange": dict(groups=("fruit", "food"), shape="sphere", hr=0.038, h=0.076,
                   rgba=(0.95, 0.55, 0.1, 1), graspable=True, washable=True,
                   freezable=True),
    "carrot": dict(groups=("vegetable", "food"), shape="cylinder", hr=0.018, h=0.11,
                   rgba=(0.9, 0.45, 0.1, 1), graspable=True, washable=True,
                   microwavable=True, freezable=True),
    "potato": dict(groups=("vegetable", "food"), shape="sphere", hr=0.032, h=0.064,
                   rgba=(0.7, 0.55, 0.3, 1), graspable=True, washable=True,
                   microwavable=True, freezable=True),
    "cucumber": dict(groups=("vegetable", "food"), shape="cylinder", hr=0.02, h=0.13,
                     rgba=(0.2, 0.5, 0.15, 1), graspable=True, washable=True,
                     freezable=True),
    "can": dict(groups=("canned_food", "food"), shape="cylinder", hr=0.032, h=0.1,
                rgba=(0.75, 0.75, 0.8, 1), graspable=True, freezable=True),
    "boxed_food": dict(groups=("packaged_food", "food"), shape="box", hr=0.04, h=0.12,
                       rgba=(0.8, 0.65, 0.3, 1), graspable=True, microwavable=True,
                       freezable=True),
    "bread": dict(groups=("bread_food", "food"), shape="box", hr=0.05, h=0.06,
                  rgba=(0.8, 0.6, 0.35, 1), graspable=True, heatable=True),
    "mug": dict(groups=("mug", "receptacle"), shape="mug", hr=0.04, h=0.09,
                rgba=(0.85, 0.85, 0.88, 1), graspable=True, washable=True,
                microwavable=True, container=True),
    "cup": dict(groups=("cup", "receptacle"), shape="cylinder", hr=0.035, h=0.1,
                rgba=(0.6, 0.75, 0.85, 1), graspable=True, washable=True,
                container=True),
    "plate": dict(groups=("plate", "receptacle"), shape="plate", hr=0.09, h=0.02,
                  rgba=(0.92, 0.92, 0.95, 1), washable=True, microwavable=True,
                  container=True),
    "bowl": dict(groups=("bowl", "receptacle"), shape="plate", hr=0.07, h=0.045,
                 rgba=(0.85, 0.9, 0.95, 1), graspable=True, washable=True,
                 microwavable=True, container=True),
    "pan": dict(groups=("pan", "cookware"), shape="pan", hr=0.1, h=0.035,
                rgba=(0.25, 0.25, 0.28, 1), graspable=True, washable=True,
                cookware=True, container=True),
    "pot": dict(groups=("pot", "cookware"), shape="cylinder", hr=0.085, h=0.09,
                rgba=(0.55, 0.55, 0.6, 1), graspable=True, washable=True,
                cookware=True, container=True),
    "kettle": dict(groups=("kettle", "cookware"), shape="cylinder", hr=0.07, h=0.1,
                   rgba=(0.4, 0.42, 0.45, 1), graspable=True, cookware=True),
    "sponge": dict(groups=("sponge", "cleaning"), shape="box", hr=0.035, h=0.03,
                   rgba=(0.95, 0.85, 0.2, 1), graspable=True, washable=True),
    "cutting_board": dict(groups=("cutting_board", "receptacle"), shape="board",
                          hr=0.16, h=0.016, rgba=(0.75, 0.6, 0.4, 1),
                          container=True),
    "knife": dict(groups=("knife", "utensil"), shape="knife", hr=0.1, h=0.02,
                  rgba=(0.3, 0.3, 0.32, 1), washable=True),
    "bottle": dict(groups=("bottled_drink", "food"), shape="cylinder", hr=0.03,
                   h=0.16, rgba=(0.3, 0.55, 0.35, 0.9), graspable=True,
                   freezable=True),
    "steak": dict(groups=("meat", "food"), shape="box", hr=0.05, h=0.03,
                  rgba=(0.55, 0.2, 0.18, 1), graspable=True, microwavable=True,
                  heatable=True, freezable=True, washable=False),
}

OBJ_GROUPS = sorted(
    {g for proto in _CATALOG.values() for g in proto["groups"]}
    | {"all", "food", "vegetable", "cookware", "container", "receptacle"}
)


def _matches_group(proto, group):
    if group == "all":
        return True
    if group == "container":
        return proto.get("container", False)
    if group == "cookware":
        return proto.get("cookware", False)
    return group in proto["groups"]


def sample_kitchen_object(
    rng,
    obj_groups="all",
    exclude_obj_groups=None,
    graspable=None,
    washable=None,
    microwavable=None,
    heatable=None,
    freezable=None,
    cookware=None,
    max_size=(None, None, None),
):
    """Sample an object category honoring group + attribute filters
    (reference kitchen_object_utils.sample_kitchen_object)."""
    if isinstance(obj_groups, str):
        obj_groups = (obj_groups,)
    if isinstance(exclude_obj_groups, str):
        exclude_obj_groups = (exclude_obj_groups,)
    exclude_obj_groups = exclude_obj_groups or ()

    valid = []
    for cat, proto in _CATALOG.items():
        if not any(_matches_group(proto, g) for g in obj_groups):
            continue
        if any(_matches_group(proto, g) for g in exclude_obj_groups):
            continue
        ok = True
        for attr, want in (
            ("graspable", graspable),
            ("washable", washable),
            ("microwavable", microwavable),
            ("heatable", heatable),
            ("freezable", freezable),
            ("cookware", cookware),
        ):
            if want is True and not proto.get(attr, False):
                ok = False
        if not ok:
            continue
        mw, md, mh = max_size
        if mw is not None and 2 * proto["hr"] > mw:
            continue
        if md is not None and 2 * proto["hr"] > md:
            continue
        if mh is not None and proto["h"] > mh:
            continue
        valid.append(cat)
    if not valid:
        raise ValueError(f"no object category matches groups={obj_groups}")
    cat = str(rng.choice(sorted(valid)))
    return make_object(cat, name=cat)


def make_object(category: str, name: str) -> KitchenObject:
    proto = _CATALOG[category]
    return KitchenObject(
        name=name,
        category=category,
        groups=proto["groups"],
        horizontal_radius=proto["hr"],
        height=proto["h"],
        rgba=proto["rgba"],
        graspable=proto.get("graspable", False),
        washable=proto.get("washable", False),
        microwavable=proto.get("microwavable", False),
        heatable=proto.get("heatable", False),
        freezable=proto.get("freezable", False),
        cookware=proto.get("cookware", False),
        container=proto.get("container", False),
        shape=proto["shape"],
    )


def object_lang(obj: KitchenObject) -> str:
    """Natural-language name (reference kitchen.py get_obj_lang:1569)."""
    return obj.category.replace("_", " ")
