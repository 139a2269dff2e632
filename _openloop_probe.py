"""Open-loop fit probe: run the trained policy over a TRAINING demo's
frame-stacked windows and compare predictions to the expert actions."""
import glob, json, sys
import numpy as np
import h5py
from lipvq_tpu.algo.rollout_policy import ICLRolloutPolicy
from lipvq_tpu.config import config_factory
from lipvq_tpu.utils import train_utils as TrainUtils
from lipvq_tpu.utils.file_utils import policy_from_checkpoint
from lipvq_tpu.utils.lang_utils import LangEncoder

def J(x): return json.loads(x) if isinstance(x, str) else x
ckpt = sys.argv[1]
demo_h5 = sys.argv[2]
model, cd = policy_from_checkpoint(ckpt)
cfg = config_factory(J(cd["config"])["algo_name"], J(cd["config"]))
sm = J(cd["shape_metadata"])
lang_encoder = LangEncoder()
ds, vds = TrainUtils.load_data_for_training(cfg, obs_keys=sm["all_obs_keys"],
                                            lang_encoder=lang_encoder)
_, _, cl = TrainUtils.make_loaders(cfg, ds, vds)
cb = model.process_batch_for_training(next(iter(cl)))
pol = ICLRolloutPolicy(model, obs_normalization_stats=None,
                       action_normalization_stats=ds.get_action_normalization_stats(),
                       lang_encoder=lang_encoder)

f = h5py.File(demo_h5, "r")
demo = f["data/demo_0"]
acts = demo["actions"][:]
obs_keys = [k for k in demo["obs"] if k in sm["all_obs_keys"]]
lang = json.loads(demo.attrs.get("ep_meta", "{}")).get("lang")
pol.start_episode(lang=lang)
T = acts.shape[0]
fs = int(cfg.train.frame_stack)
errs = []
for t in range(0, T, 5):
    window = {}
    for k in obs_keys:
        arr = demo["obs"][k][:]
        idx = np.clip(np.arange(t - fs + 1, t + 1), 0, T - 1)
        window[k] = arr[idx].astype(np.float32)
    a = np.asarray(pol(window, cb))[: acts.shape[1]]
    errs.append(np.abs(a - acts[t]))
    if t % 15 == 0:
        print(f"t={t} pred={np.round(a[[0,1,2,5,6,7,11]],2)} "
              f"true={np.round(acts[t][[0,1,2,5,6,7,11]],2)}")
errs = np.stack(errs)
print("mean |err| per channel:", np.round(errs.mean(axis=0), 3))
print("action std per channel:", np.round(acts.std(axis=0), 3))
