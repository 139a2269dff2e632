"""Collision-aware object placement samplers.

Counterpart of reference robocasa/utils/placement_samplers.py:19-622
(UniformRandomSampler / SequentialCompositeSampler): rejection-sample
object poses inside a fixture's sampling region, keeping horizontal
separation from already-placed objects.

The reference threads ``pos``/``offset``/``size``/``rotation`` through
each task's object cfg (kitchen.py:684-878); this module keeps those
knob names and semantics:

- ``size``: requested (x, y) extent of the sampling window, clipped to
  the fixture region;
- ``pos``: per-axis bias in [-1, 1] or None (uniform); "ref" means
  "centered on the region" here (region centering near a reference
  fixture is resolved by Fixture.sample_region);
- ``offset``: additive (x, y) local offset;
- ``rotation``: scalar/range/list-of-ranges for the yaw draw
  (reference placement_samplers.py:234-268).
"""

from __future__ import annotations

import numpy as np


class RandomizationError(RuntimeError):
    pass


def _draw_rotation(rng, rotation):
    if rotation is None:
        return float(rng.uniform(0, 2 * np.pi))
    if isinstance(rotation, (int, float)):
        return float(rotation)
    rotation = list(rotation)
    if rotation and isinstance(rotation[0], (list, tuple)):
        lo, hi = rotation[rng.integers(len(rotation))]
    else:
        lo, hi = rotation
    return float(rng.uniform(lo, hi))


def _axis_value(rng, half, bias):
    """Sample one local axis coordinate within [-half, half].

    ``bias`` in [-1, 1] pins the draw toward that fraction of the
    window (reference placement_samplers.py:214-233 pos semantics);
    None/"ref" -> uniform.
    """
    if bias is None or bias == "ref":
        return float(rng.uniform(-half, half))
    bias = float(np.clip(bias, -1.0, 1.0))
    return float(bias * half)


def sample_object_placement(
    rng,
    fixture,
    obj,
    placed,
    size=(0.3, 0.3),
    pos=(None, None),
    offset=(0.0, 0.0),
    rotation=None,
    margin=0.01,
    ensure_object_boundary_in_range=True,
    ensure_valid_placement=True,
    sample_region_kwargs=None,
    max_attempts=200,
):
    """Rejection-sample a world pose for ``obj`` on/in ``fixture``.

    Returns (world_pos, yaw). Raises RandomizationError after
    ``max_attempts`` failed draws (reference
    placement_samplers.py:270-414).
    """
    region_c, region_half = fixture.sample_region(**(sample_region_kwargs or {}))
    # clip the requested window into the region
    half_x = min(size[0] / 2, region_half[0])
    half_y = min(size[1] / 2, region_half[1])
    if ensure_object_boundary_in_range:
        half_x = max(half_x - obj.horizontal_radius, 0.0)
        half_y = max(half_y - obj.horizontal_radius, 0.0)

    if pos is None:
        pos = (None, None)
    for _ in range(max_attempts):
        lx = region_c[0] + _axis_value(rng, half_x, pos[0]) + offset[0]
        ly = region_c[1] + _axis_value(rng, half_y, pos[1]) + offset[1]
        yaw = _draw_rotation(rng, rotation)
        world = fixture.to_world([lx, ly, region_c[2] + 0.002])
        if not ensure_valid_placement:
            return world, yaw
        ok = True
        for other_pos, other_r in placed:
            dist = np.linalg.norm(world[:2] - np.asarray(other_pos)[:2])
            if dist < obj.horizontal_radius + other_r + margin:
                ok = False
                break
        if ok:
            return world, yaw
    raise RandomizationError(
        f"could not place {obj.name} on {fixture.name} after {max_attempts} tries"
    )


class SequentialCompositeSampler:
    """Places a list of object cfgs in order, accumulating collision
    state (reference placement_samplers.py:416-568)."""

    def __init__(self, rng):
        self.rng = rng
        self.placed = []  # [(world_pos, radius)]

    def place(self, fixture, obj, placement):
        kwargs = {
            k: placement[k]
            for k in (
                "size",
                "pos",
                "offset",
                "rotation",
                "margin",
                "ensure_object_boundary_in_range",
                "ensure_valid_placement",
                "sample_region_kwargs",
            )
            if k in placement
        }
        world, yaw = sample_object_placement(
            self.rng, fixture, obj, self.placed, **kwargs
        )
        self.placed.append((world, obj.horizontal_radius))
        return world, yaw
