"""Config kernel + registry tests (reference semantics:
robomimic/config/config.py lock/unlock, base_config.py factory)."""

import json

import pytest

from lipvq_tpu.config import (
    Config,
    ConfigLockError,
    config_factory,
    config_from_json,
)


def test_lock_semantics():
    c = Config()
    c.a.b.value = 1
    c.lock()
    assert c.is_locked
    with pytest.raises(ConfigLockError):
        c.a.b.value = 2
    with pytest.raises(ConfigLockError):
        c.new_key = 3
    with c.values_unlocked():
        c.a.b.value = 2
        with pytest.raises(ConfigLockError):
            c.a.new_key = 4
    assert c.a.b.value == 2
    with c.unlocked():
        c.brand_new = 5
    assert c.brand_new == 5
    with pytest.raises(ConfigLockError):
        c.another = 6


def test_json_roundtrip():
    c = Config()
    c.train.batch_size = 16
    c.algo.transformer.vq_vae_enabled = True
    s = c.dump()
    c2 = Config.from_json(s)
    assert c2.train.batch_size == 16
    assert c2.algo.transformer.vq_vae_enabled is True


def test_icl_factory_defaults():
    cfg = config_factory("icl")
    assert cfg.algo_name == "icl"
    assert cfg.algo.transformer.context_length == 10
    assert cfg.algo.transformer.embed_dim == 512
    assert cfg.algo.transformer.num_layers == 6
    assert cfg.algo.transformer.num_heads == 8
    # tokenizer switches (reference icl_config.py:154-157)
    assert cfg.algo.transformer.vq_vae_enabled is False
    assert cfg.algo.transformer.ln_act_enabled is True
    assert cfg.algo.gmm.num_modes == 5
    assert cfg.train.hdf5_load_next_obs is False
    assert cfg.is_locked


def test_factory_override_unknown_key_errors():
    with pytest.raises(ConfigLockError):
        config_factory("icl", {"algo": {"transformer": {"typo_key": 1}}})


def test_factory_override():
    cfg = config_factory(
        "icl",
        {
            "train": {"batch_size": 8, "seq_length": 10},
            "algo": {"transformer": {"vq_vae_enabled": True, "ln_act_enabled": False}},
        },
    )
    assert cfg.train.batch_size == 8
    assert cfg.algo.transformer.vq_vae_enabled is True


def test_template_style_json(tmp_path):
    template = {
        "algo_name": "icl",
        "train": {"batch_size": 100, "seq_length": 10, "frame_stack": 10},
        "algo": {
            "gmm": {"enabled": True},
            "transformer": {
                "enabled": True,
                "supervise_all_steps": True,
                "pred_future_acs": True,
                "causal": False,
                "vq_vae_enabled": True,
                "ln_act_enabled": False,
            },
        },
    }
    p = tmp_path / "icl_transformer.json"
    p.write_text(json.dumps(template))
    cfg = config_from_json(str(p))
    assert cfg.algo.transformer.pred_future_acs is True
    assert cfg.algo.transformer.causal is False
    assert cfg.algo.transformer.vq_vae_enabled is True


def test_mamba_config():
    cfg = config_factory("icl_mamba")
    assert cfg.algo.mamba.d_state == 8
    assert cfg.algo.mamba.d_conv == 4
    assert cfg.algo.mamba.expand == 2
