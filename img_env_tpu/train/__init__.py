"""On-device RL training loops (PPO) over the batched environment."""

from img_env_tpu.train.ppo import PpoConfig, TrainState, make_train_step, obs_features

__all__ = ["PpoConfig", "TrainState", "make_train_step", "obs_features"]
