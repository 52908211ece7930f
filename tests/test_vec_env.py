"""Stateful vectorized env wrapper tests."""

import numpy as np
import pytest

from jssenv_tpu import instances as inst
from jssenv_tpu.envs.vec_env import JssVectorEnv


def test_reset_and_shapes():
    env = JssVectorEnv("ta01", num_envs=8)
    obs = env.reset()
    assert obs["real_obs"].shape == (8, 15, 7)
    assert obs["action_mask"].shape == (8, 16)
    assert obs["action_mask"][:, :15].all()
    assert not obs["action_mask"][:, 15].any()


def test_step_and_autoreset_episode():
    env = JssVectorEnv("ta01", num_envs=16)
    env.reset()
    rng = np.random.default_rng(0)
    finished = 0
    for t in range(600):
        a = env.sample_legal_actions(int(rng.integers(2**31)))
        obs, reward, done, info = env.step(a)
        if done.any():
            finished += int(done.sum())
            ms = info["makespan"][done]
            assert (ms >= 1231).all()
            # autoreset: finished lanes come back with a fresh full mask
            assert obs["action_mask"][done][:, :15].all()
        if finished >= 16:
            break
    assert finished >= 16, "lanes should complete episodes within 600 steps"


def test_mixed_instance_lanes():
    iset = inst.get_instance_set(["ta01", "ta41"])
    env = JssVectorEnv(iset, num_envs=4)
    obs = env.reset()
    # lanes tile round-robin: ta01 (15 jobs) and ta41 (30 jobs) alternate
    assert obs["action_mask"].shape == (4, 31)
    assert obs["action_mask"][0, :15].all() and not obs["action_mask"][0, 15:30].any()
    assert obs["action_mask"][1, :30].all()


def test_no_autoreset_holds_terminal():
    env = JssVectorEnv("ta01", num_envs=4, autoreset=False)
    env.reset()
    rng = np.random.default_rng(1)
    done_seen = np.zeros(4, bool)
    for t in range(600):
        a = env.sample_legal_actions(int(rng.integers(2**31)))
        obs, reward, done, info = env.step(a)
        done_seen |= done
        if done_seen.all():
            break
    assert done_seen.all()
    # terminal lanes have an all-false mask and stay terminal
    obs, reward, done, info = env.step(np.zeros(4, np.int64) + 15)
    assert not obs["action_mask"].any()
