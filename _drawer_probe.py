import glob, json, numpy as np
from lipvq_tpu.algo.rollout_policy import ICLRolloutPolicy
from lipvq_tpu.config import config_factory
from lipvq_tpu.envs.env_factory import create_env_from_metadata
from lipvq_tpu.envs.wrappers import FrameStackWrapper
from lipvq_tpu.utils import train_utils as TrainUtils
from lipvq_tpu.utils.file_utils import policy_from_checkpoint
from lipvq_tpu.utils.lang_utils import LangEncoder

def J(x): return json.loads(x) if isinstance(x, str) else x
ckpt = glob.glob("/tmp/kconv10/test/*/models/model_epoch_150.ckpt")[0]
model, cd = policy_from_checkpoint(ckpt)
cfg = config_factory(J(cd["config"])["algo_name"], J(cd["config"]))
lang_encoder = LangEncoder()
sm = J(cd["shape_metadata"])
ds, vds = TrainUtils.load_data_for_training(cfg, obs_keys=sm["all_obs_keys"],
                                            lang_encoder=lang_encoder)
_, _, cl = TrainUtils.make_loaders(cfg, ds, vds)
cb = model.process_batch_for_training(next(iter(cl)))
pol = ICLRolloutPolicy(model, obs_normalization_stats=None,
                       action_normalization_stats=ds.get_action_normalization_stats(),
                       lang_encoder=lang_encoder)
env = create_env_from_metadata(J(cd["env_metadata"]))
env = FrameStackWrapper(env, num_frames=int(cfg.train.frame_stack))
ob = env.reset()
pol.start_episode(lang=getattr(env.unwrapped, "_ep_lang_str", None))
k = env.unwrapped.env
dw = k.drawer
for t in range(250):
    a = np.asarray(pol(ob, cb))
    ob, r, dn, info = env.step(a)
    if t % 20 == 0:
        bar = k.geom_xpos(dw.handle_name)
        eef = k.eef_pos(); b = k.data.body("robot0_base").xpos
        frac = dw.get_door_state(k)["drawer"]
        print(f"t={t} a[:3]={np.round(a[:3],2)} a5={a[5]:+.2f} a6={a[6]:+.2f} "
              f"a7:10={np.round(a[7:10],2)} a11={a[11]:+.2f} "
              f"eef-bar={np.round(eef-bar,2)} frac={frac:.2f} base={np.round(b[:2],2)}")
print("success:", env.is_success()["task"])
