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
    assert loaded >= 108
    assert sampled >= 100


def test_corpus_multi_regions_build():
    """stage_train.yaml carries range_multi region lists (agents 5-6).  It
    uses the historical FLAT schema (robot_total / top-level pose lists)
    that the current reference loader can't consume either — so nest its
    fields and check the sampler encodes the 5 candidate regions."""
    raw = read_yaml(os.path.join(REF_CFG, "old_cfg", "stage_train.yaml"))
    cfg = EnvConfig.from_dict({
        "robot": {
            "total": raw["robot_total"],
            "begin_poses_type": raw["begin_poses_type"],
            "begin_poses": raw["begin_poses"],
            "target_poses_type": raw["target_poses_type"],
            "target_poses": raw["target_poses"],
        },
        "ped_sim": {"total": 0},
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
    })
    spec = SamplerSpec.from_config(cfg)
    assert spec.begin_params.shape[1] == 5
    assert int(spec.begin_nreg[5]) == 5 and int(spec.begin_nreg[6]) == 5
    assert int(spec.begin_nreg[0]) == 1


def test_shipped_configs_build_envs():
    """Every yaml shipped under img_env_tpu/configs constructs a NavEnv and
    resets one episode (guards the package's own examples/docs configs the
    reference-corpus sweep does not cover)."""
    import glob
    import os

    import jax

    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "img_env_tpu", "configs")
    files = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(files) >= 8
    for f in files:
        cfg = EnvConfig.from_yaml(f)
        if cfg.robot.total * max(cfg.ped_sim.total, 1) > 64:
            continue   # bench-scale configs are covered by bench/test_bench
        env = NavEnv(cfg, jit=False)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.sensor_maps.shape[0] == cfg.robot.total, f
