"""Image-modality tests: VisualCore + crop randomizer + FiLM language
conditioning, end-to-end through the ICL algo with an rgb obs key."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lipvq_tpu.models.obs_core import (
    CropRandomizer,
    ResNet18Conv,
    SpatialSoftmax,
    VisualCore,
)


def test_resnet18_shapes(rng):
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    net = ResNet18Conv()
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (2, 2, 2, 512)
    assert "batch_stats" in variables


def test_resnet18_film_conditioning(rng):
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 16), dtype=np.float32))
    net = ResNet18Conv()
    variables = net.init(jax.random.PRNGKey(0), x, film_cond=cond)
    out1 = net.apply(variables, x, film_cond=cond)
    out2 = net.apply(variables, x, film_cond=cond * 2.0)
    # FiLM layers must actually modulate features
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_spatial_softmax_keypoints(rng):
    x = jnp.asarray(rng.random((3, 8, 8, 16), dtype=np.float32))
    net = SpatialSoftmax(num_kp=10)
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (3, 20)
    assert (np.abs(np.asarray(out)) <= 1.0).all()  # normalized coords


def test_crop_randomizer():
    rand = CropRandomizer(crop_height=24, crop_width=24, num_crops=2)
    x = jnp.asarray(np.arange(2 * 32 * 32 * 3, dtype=np.float32).reshape(
        2, 32, 32, 3
    ))
    # eval: deterministic center crop
    out = rand.forward_in(x, train=False)
    assert out.shape == (2, 24, 24, 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[:, 4:28, 4:28]))
    # train: n random crops folded into batch
    out = rand.forward_in(x, train=True, rng=jax.random.PRNGKey(0))
    assert out.shape == (4, 24, 24, 3)
    feats = jnp.ones((4, 7))
    pooled = rand.forward_out(feats, train=True)
    assert pooled.shape == (2, 7)


def test_visual_core_full(rng):
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    core = VisualCore(feature_dimension=48, num_kp=16, crop_height=24,
                      crop_width=24)
    variables = core.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    out = core.apply(variables, x)  # eval path
    assert out.shape == (2, 48)
    out_t, _ = core.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out_t.shape == (2, 48)


@pytest.mark.slow
def test_icl_image_modality_end_to_end(rng):
    """Full ICL train step with an rgb key through FiLM VisualCore + crop
    (the robocasa image config path, reference config_gen_utils.py:89-149)."""
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.utils import obs_utils as ObsUtils

    obs_key_shapes = {
        "robot0_eef_pos": [3],
        "lang_emb": [768],
        "robot0_agentview_left_image": [24, 24, 3],
    }
    cfg = config_factory("icl", {
        "train": {"batch_size": 4},
        "algo": {
            "gmm": {"enabled": True},
            "transformer": {"enabled": True, "embed_dim": 64,
                            "num_layers": 1, "num_heads": 4,
                            "supervise_all_steps": True,
                            "pred_future_acs": True, "causal": False,
                            "vq_vae_enabled": True, "ln_act_enabled": False},
            "vq": {"num_codes": 16},
        },
        "observation": {
            "modalities": {"obs": {
                "low_dim": ["robot0_eef_pos", "lang_emb"],
                "rgb": ["robot0_agentview_left_image"],
            }},
            "encoder": {"rgb": {
                "core_class": "VisualCoreLanguageConditioned",
                "core_kwargs": {"feature_dimension": 32,
                                "pool_kwargs": {"num_kp": 8}},
                "obs_randomizer_class": "CropRandomizer",
                "obs_randomizer_kwargs": {"crop_height": 20, "crop_width": 20,
                                          "num_crops": 1},
            }},
        },
    })
    ObsUtils.initialize_obs_utils_with_config(cfg)
    model = algo_factory("icl", cfg, obs_key_shapes, ac_dim=12)
    # VisualCore features replace raw pixels in the flat obs dim
    B, T = 4, 19
    batch = {
        "obs": {
            "robot0_eef_pos": rng.standard_normal((B, T, 3), dtype=np.float32),
            "lang_emb": rng.standard_normal((B, T, 768), dtype=np.float32),
            "robot0_agentview_left_image": rng.integers(
                0, 255, (B, T, 24, 24, 3)
            ).astype(np.uint8),
        },
        "actions": rng.standard_normal((B, T, 12)).astype(np.float32) * 0.3,
    }
    pb = model.process_batch_for_training(batch)
    # uint8 -> float [0,1] processing happened
    assert pb["obs"]["robot0_agentview_left_image"].dtype == np.float32
    assert pb["obs"]["robot0_agentview_left_image"].max() <= 1.0
    info = model.train_on_batch(pb, epoch=0)
    assert np.isfinite(float(info["losses"]["action_loss"]))
    ctx = {"obs": {k: v[:1] for k, v in pb["obs"].items()},
           "actions": pb["actions"][:1]}
    a = model.get_action({k: v[:1] for k, v in pb["obs"].items()}, ctx)
    assert a.shape == (1, 12) and np.isfinite(a).all()


def test_cross_attention_core():
    """ResNet18ConvCrossAttention analogue (reference base_nets.py:944):
    feature-map patches query the lang embedding through 8-head
    attention; output keeps the conv feature-map shape."""
    import jax
    import jax.numpy as jnp

    from lipvq_tpu.models.obs_core import VisualCore

    core = VisualCore(
        feature_dimension=32, backbone="ResNet18ConvCrossAttention",
        pool="SpatialMeanPool",
    )
    v = core.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 32, 32, 3)),
        train=False, lang_emb=jnp.zeros((2, 768)),
    )
    out = core.apply(
        v, jnp.ones((2, 32, 32, 3)), train=False,
        lang_emb=jnp.ones((2, 768)),
    )
    assert out.shape == (2, 32)
    assert bool(jnp.isfinite(out).all())
    # conditioning is real: different lang_emb -> different features
    out2 = core.apply(
        v, jnp.ones((2, 32, 32, 3)), train=False,
        lang_emb=-jnp.ones((2, 768)),
    )
    assert float(jnp.abs(out - out2).max()) > 1e-6
