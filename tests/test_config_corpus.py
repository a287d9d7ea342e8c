"""The full reference config corpus loads unchanged.

Every yaml under the reference checkout's envs/cfg/ (canonical, old_cfg
history, gazebo_cfg, real_exp) must parse into EnvConfig with the same
field names, and any config with agents must build a SamplerSpec —
including ``*_multi`` region lists and the historical shape strings
('L', 'sweep', ...) that get_robot_radius tolerates (reset_helper.py:14-27).
"""

import glob
import os

import pytest
import yaml

from img_env_tpu.config import EnvConfig, read_yaml
from img_env_tpu.env.sampler import SamplerSpec

REF_CFG = "/root/reference/envs/cfg"

# configs the REFERENCE'S OWN loader also rejects (verified):
# image_kejia.yaml is malformed yaml; master_difficulty_env.yaml parses to
# None (comments only) and yaml_env crashes on cfg['robot'].
KNOWN_BROKEN = {"image_kejia.yaml", "master_difficulty_env.yaml"}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CFG), reason="reference checkout not present")


def _corpus():
    return sorted(glob.glob(os.path.join(REF_CFG, "**", "*.yaml"),
                            recursive=True))


def test_corpus_is_substantial():
    assert len(_corpus()) >= 100


def test_whole_corpus_loads():
    loaded = 0
    sampled = 0
    multi = 0
    for f in _corpus():
        if os.path.basename(f) in KNOWN_BROKEN:
            with pytest.raises(Exception):
                d = yaml.safe_load(open(f))
                EnvConfig.from_dict(d)
            continue
        cfg = EnvConfig.from_dict(read_yaml(f))
        loaded += 1
        if cfg.robot.total + cfg.ped_sim.total > 0:
            spec = SamplerSpec.from_config(cfg)
            sampled += 1
            if spec.begin_params.shape[1] > 1 or spec.target_params.shape[1] > 1:
                multi += 1
    assert loaded >= 108
    assert sampled >= 100
    assert multi >= 1     # the corpus exercises the multi-region path
