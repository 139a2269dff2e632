"""USD episode export (reference robocasa/utils/usd/ tooling)."""

import pytest

mujoco = pytest.importorskip("mujoco")


def test_export_episode_usda(tmp_path):
    from lipvq_tpu.robocasa.usd_export import export_episode

    out = str(tmp_path / "ep.usda")
    path = export_episode("CloseDrawer", steps=5, output=out, seed=2)
    text = open(path).read()
    assert text.startswith("#usda 1.0")
    assert 'def Xform "World"' in text
    # static walls are single transforms, moving bodies time-sampled
    assert "timeSamples" in text
    assert text.count("def Cube") > 50
    assert "displayColor" in text
    # the robot base moves -> time samples under its xform
    assert "robot0_base" in text
