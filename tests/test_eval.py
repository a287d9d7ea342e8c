"""Recorder / replay / renderer / checkpoint round trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.eval.recorder import (
    EpisodeRecorder,
    ScenarioBank,
    load_state,
    save_state,
)


def test_scenario_bank_roundtrip(tmp_path):
    bank = ScenarioBank.generate(7, 5)
    assert len(bank) == 5
    p = str(tmp_path / "bank.npz")
    bank.save(p)
    bank2 = ScenarioBank.load(p)
    np.testing.assert_array_equal(bank.keys, bank2.keys)
    # keys are distinct per episode
    assert len({tuple(k) for k in bank.keys}) == 5


def test_recorder_summary_and_roundtrip(tmp_path):
    class S:  # minimal stand-in for WorldState
        pass

    rec = EpisodeRecorder(dt=0.4)
    for ep in range(2):
        rec.start_episode()
        for t in range(4):
            s = S()
            s.robots = type("R", (), {})()
            s.robots.pose = np.asarray([[0.1 * t, 0.0, 0.0]])
            s.robots.vw_last0 = np.asarray([[0.25, 0.0]])
            s.peds = type("P", (), {})()
            s.peds.pos = np.zeros((2, 2))
            rec.add_step(s, reward=np.asarray([1.0]))
        rec.end_episode(dones_info=np.asarray([5 if ep == 0 else 10]))
    summ = rec.summary()
    assert summ["episodes"] == 2
    assert abs(summ["arrive_rate"] - 0.5) < 1e-9
    assert summ["avg_abs_v"] > 0

    p = str(tmp_path / "rec.npz")
    rec.save(p)
    rec2 = EpisodeRecorder.load(p)
    assert len(rec2.episodes) == 2
    np.testing.assert_allclose(
        np.asarray(rec2.episodes[0].robot_poses),
        np.asarray(rec.episodes[0].robot_poses))


def test_state_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3), "b": (jnp.zeros(4), jnp.ones(()))}
    p = str(tmp_path / "st.npz")
    save_state(p, tree)
    like = jax.tree_util.tree_map(jnp.zeros_like, tree)
    back = load_state(p, like)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(6).reshape(2, 3))


def test_reset_determinism_same_key():
    """Same PRNG key -> bit-identical scenario (replay-by-key foundation)."""
    from tests.test_parallel import tiny_cfg
    from img_env_tpu.env.nav_env import NavEnv

    env = NavEnv(tiny_cfg(robots=2, peds=1), jit=False)
    k = jax.random.PRNGKey(123)
    s1, o1 = env.reset_fn(k)
    s2, o2 = env.reset_fn(k)
    np.testing.assert_array_equal(np.asarray(s1.robots.pose), np.asarray(s2.robots.pose))
    np.testing.assert_array_equal(np.asarray(s1.peds.pos), np.asarray(s2.peds.pos))
    np.testing.assert_array_equal(np.asarray(o1.sensor_maps), np.asarray(o2.sensor_maps))


def test_render_frame():
    from tests.test_parallel import tiny_cfg
    from img_env_tpu.env.nav_env import NavEnv
    from img_env_tpu.eval.render import render_frame, render_tiles

    env = NavEnv(tiny_cfg(robots=2, peds=1), jit=False)
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    img = render_frame(state, env.statics)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    tiles = render_tiles(obs.sensor_maps)
    assert tiles.shape[2] == 3


def test_live_viewer_composite_headless():
    """show_gui composite (img_env.cpp:676-710): map+labels left, framed
    view tiles right; headless backend keeps the frame retrievable and the
    runtime toggle stops/resumes updates."""
    from tests.test_parallel import tiny_cfg
    from img_env_tpu.env.nav_env import NavEnv
    from img_env_tpu.eval.live_view import LiveViewer, compose_gui

    env = NavEnv(tiny_cfg(robots=3, peds=1), jit=False)
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    sm = np.asarray(obs.sensor_maps)

    img = compose_gui(state, env.statics, sm, env.cfg, window_height=240)
    assert img.dtype == np.uint8 and img.shape[0] >= 240
    assert img.shape[1] > 240          # map panel + tile column
    # red tile frames present in the right panel
    right = img[:, -96:]
    assert (right == np.asarray([255, 0, 0])).all(-1).any()

    v = LiveViewer(env.statics, env.cfg, backend="none", window_height=240)
    out = v.update(state, sm)
    assert out is not None and v.last_frame is not None
    v.on = False                        # the runtime show_gui toggle
    assert v.update(state, sm) is None
    v.on = True
    assert v.update(state, sm) is not None
    v.close()


def test_bagreader_indicators_and_comparison(tmp_path):
    """BagReader.cal_indicator parity surface: per-robot rates + extra
    time/distance conditioned on arrivals, and the 2-method comparison
    figure + csv (bag.py:897-1109)."""
    from img_env_tpu.eval.plots import compare_methods, per_robot_indicators
    from img_env_tpu.eval.recorder import EpisodeRecorder, EpisodeRecord

    def synth(v, outcome):
        """Straight-line episode at speed v toward a goal 4 m away."""
        rec = EpisodeRecord()
        steps = int(4.0 / (v * 0.4)) + 2
        for t in range(steps):
            x = min(1.0 + v * 0.4 * t, 5.0)
            rec.robot_poses.append(np.asarray([[x, 1.0, 0.0]]))
            rec.robot_vws.append(np.asarray([[v, 0.05]]))
            rec.ped_poses.append(np.zeros((0, 2)))
        rec.goals = np.asarray([[5.0, 1.0]])
        rec.dones_info = np.asarray([outcome])
        return rec

    fast = EpisodeRecorder(dt=0.4)
    fast.episodes = [synth(0.6, 5), synth(0.6, 5), synth(0.6, 1)]
    slow = EpisodeRecorder(dt=0.4)
    slow.episodes = [synth(0.3, 5), synth(0.3, 10), synth(0.3, 5)]

    ind = per_robot_indicators(fast)
    assert ind[0]["arrive_rate"] == pytest.approx(2 / 3)
    assert ind[0]["collision_rate"] == pytest.approx(1 / 3)
    assert ind["all"]["extra_distance"][0] == pytest.approx(0.3, abs=0.35)
    # slow method: same path, double time -> larger extra time
    ind_s = per_robot_indicators(slow)
    assert ind_s["all"]["extra_time"][0] > ind["all"]["extra_time"][0]
    assert ind_s["all"]["stuck_rate"] == pytest.approx(1 / 3)

    out = str(tmp_path / "cmp")
    table = compare_methods({"fast": fast, "slow": slow}, out)
    import os
    assert set(table) == {"fast", "slow"}
    for f in ("traj_fast.png", "traj_slow.png", "vw_fast.png",
              "comparison.png", "comparison.csv"):
        assert os.path.exists(os.path.join(out, f)), f
    csv = open(os.path.join(out, "comparison.csv")).read()
    assert "extra_time_mean" in csv and "fast" in csv and "slow" in csv


def test_ep_split_composite_and_odom_vw(tmp_path):
    """Publication-style figures (bag.py:447-613 ep_split trajectory
    composites with footprint circles + goal stars; bag.py:751-896
    commanded-vs-odom velocity panels)."""
    from img_env_tpu.eval.plots import plot_ep_split, plot_vw_odom
    from img_env_tpu.eval.recorder import EpisodeRecord, EpisodeRecorder

    def synth(outcome, with_ped=True):
        rec = EpisodeRecord()
        for t in range(12):
            x = 1.0 + 0.2 * t
            rec.robot_poses.append(
                np.asarray([[x, 2.0, 0.1 * t], [2.0, x, 1.0]]))
            rec.robot_vws.append(np.asarray([[0.5, 0.25], [0.5, 0.0]]))
            rec.ped_poses.append(
                np.asarray([[3.0, 1.0 + 0.1 * t]]) if with_ped
                else np.zeros((0, 2)))
        rec.goals = np.asarray([[4.0, 2.0], [2.0, 4.0]])
        rec.dones_info = np.asarray([outcome, 5])
        return rec

    rec = EpisodeRecorder(dt=0.4)
    rec.episodes = [synth(5), synth(1), synth(10, with_ped=False)]

    p1 = plot_ep_split(rec, out=str(tmp_path / "ep_split.png"))
    p2 = plot_vw_odom(rec, episode=0, robot=0,
                      out=str(tmp_path / "vw_odom.png"))
    import os

    assert os.path.getsize(p1) > 20_000     # a real multi-panel composite
    assert os.path.getsize(p2) > 10_000
