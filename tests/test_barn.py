"""BARN benchmark suite end-to-end over generated occupancy worlds.

The reference's BarnDataSetWrapper (evaluation_wrapper/BarnDataSetWrapper.py:
14-110) relaunches Gazebo per world and appends per-episode metric lines.
Here the suite runs over the shipped BARN-style PNG worlds without Gazebo.
"""

import csv
import os

import numpy as np

from img_env_tpu.config import EnvConfig
from img_env_tpu.datasets import barn
from img_env_tpu.eval.barn import run_barn_suite

MAPS = os.path.join(os.path.dirname(barn.__file__), "..", "maps")


def test_generate_world_connected_and_banded():
    occ = barn.generate_barn_world(seed=3)
    assert occ.shape == (30, 30)
    assert not occ[:4].any() and not occ[-4:].any()   # clear start/goal bands
    assert barn._connected(occ, 4)
    assert 0.02 < occ.mean() < 0.6


def test_shipped_worlds_exist():
    for i in range(3):
        p = os.path.join(MAPS, f"barn_world_{i}.png")
        assert os.path.exists(p), p


def test_barn_suite_end_to_end(tmp_path):
    worlds = [os.path.join(MAPS, f"barn_world_{i}.png") for i in range(3)]
    cfg = EnvConfig.from_dict(barn.world_cfg_dict(worlds[0], n_beams=48))
    cfg = cfg.replace(time_max=25)

    def policy(key, obs):
        return np.asarray([[0.6, 0.0]])        # drive straight at the goal

    csv_path = str(tmp_path / "barn.csv")
    txt_path = str(tmp_path / "barn_episodes.txt")
    rows = run_barn_suite(
        worlds, cfg, policy, episodes_per_world=1, max_steps=30,
        output_csv=csv_path, output_txt=txt_path)

    assert len(rows) == 3
    assert {r["world"] for r in rows} == {
        f"barn_world_{i}.png" for i in range(3)}
    with open(csv_path) as f:
        got = list(csv.DictReader(f))
    assert len(got) == 3 and "arrive_rate" in got[0]
    # reference-format per-episode lines: 13 comma-separated fields
    with open(txt_path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    assert len(lines) == 3
    assert all(len(ln.split(",")) == 13 for ln in lines)
    # every episode terminated with a known outcome code
    for r in rows:
        assert r["episodes"] >= 1
