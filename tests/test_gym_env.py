"""Gym wrapper tests: registration, reference API surface, rule/wrapper
integration, attribute mirrors, and the golden replay through the wrapper."""

import json
import os

import numpy as np
import pytest

import jssenv_tpu  # registers jss-v1
from jssenv_tpu.envs.gym_env import JssEnv
from jssenv_tpu.rules import dispatching as dsp
from jssenv_tpu.utils import assign_env_config, create_env

gym = pytest.importorskip("gymnasium")

_DATA = os.path.join(os.path.dirname(__file__), "data", "golden_solutions.json")


def test_gym_make_and_default_instance():
    env = gym.make("jss-v1").unwrapped
    assert isinstance(env, JssEnv)
    # reference default config is the bundled ta80 (jss_env.py:35-38)
    assert (env.jobs, env.machines) == (100, 20)


def test_reset_and_spaces():
    env = JssEnv({"instance_path": "ta01"})
    obs = env.reset()
    assert set(obs) == {"real_obs", "action_mask"}
    assert obs["real_obs"].shape == (15, 7)
    assert obs["action_mask"].shape == (16,)
    assert obs["action_mask"][:15].all() and not obs["action_mask"][15]
    assert env.action_space.n == 16
    assert env.current_time_step == 0
    assert env.nb_legal_actions == 15


def test_step_api_shape():
    env = JssEnv({"instance_path": "ta01"})
    env.reset()
    obs, reward, done, truncated, info = env.step(0)
    assert isinstance(reward, float) and reward > 0
    assert truncated is False and info == {}
    assert not done
    assert env.solution[0][0] == 0  # first op of job 0 starts at t=0


def test_random_episode_and_attributes():
    env = JssEnv({"instance_path": "ta01"})
    env.reset()
    rng = np.random.default_rng(0)
    done = False
    while not done:
        mask = env.get_legal_actions().astype(np.float64)
        a = rng.choice(len(mask), p=mask / mask.sum())
        obs, reward, done, _, _ = env.step(int(a))
        assert env.nb_legal_actions == int(mask_sum := env.legal_actions[:-1].sum())
    assert env.last_time_step == env.current_time_step
    assert (env.last_solution >= 0).all()
    assert env.next_time_step == []
    assert (env.todo_time_step_job == env.machines).all()


def test_golden_replay_through_wrapper():
    """Reference golden-test driver pattern against the wrapper surface."""
    with open(_DATA) as f:
        entry = json.load(f)["ta01"]
    env = JssEnv({"instance_path": "ta01"})
    env.reset()
    seq = entry["machine_order"]
    idx = [0] * env.machines
    done = False
    while not done:
        acted = False
        for m in range(env.machines):
            if done:
                break
            if env.machine_legal[m] and idx[m] < env.jobs:
                a = seq[m][idx[m]]
                if env.needed_machine_jobs[a] == m and env.legal_actions[a]:
                    _, _, done, _, _ = env.step(a)
                    idx[m] += 1
                    acted = True
        if not acted and not done:
            assert len(env.next_time_step) > 0
            prev = env.current_time_step
            env.increase_time_step()
            assert env.current_time_step > prev
    assert env.current_time_step == entry["optimum"]
    env.reset()
    assert env.current_time_step == 0


def test_rules_on_wrapper():
    env = JssEnv({"instance_path": "ta01"})
    reward, makespan = dsp.get_rule("SPT").run_episode(env)
    assert makespan >= 1231
    res = dsp.compare_rules(env, rules=["SPT", "LOR"], num_episodes=1)
    assert set(res) == {"SPT", "LOR"}
    assert res["SPT"]["avg_makespan"] == makespan  # deterministic without coin


def test_rule_exploration_seeded():
    env1 = JssEnv({"instance_path": "ta01", "rule_seed": 7})
    env2 = JssEnv({"instance_path": "ta01", "rule_seed": 7})
    r1 = dsp.get_rule("SPT").run_episode(env1)
    r2 = dsp.get_rule("SPT").run_episode(env2)
    assert r1 == r2  # deterministic under the same seed


def test_create_env_and_config_utils():
    cls = create_env("jss-v1")
    assert cls is JssEnv
    cls2 = create_env({"env": "jss-v1"})
    assert cls2 is JssEnv
    with pytest.raises(NotImplementedError):
        create_env("nope-v0")

    class Obj:
        pass

    o = Obj()
    o.x = 1
    o.env_config = {"x": "5", "y": [1, 2]}
    assign_env_config(o, {"z": 3})
    assert o.z == 3 and o.x == 5 and o.y == [1, 2]


def test_instance_from_file_path(tmp_path):
    spec = jssenv_tpu.get_instance("ta02")
    p = tmp_path / "custom"
    p.write_text(spec.to_text())
    env = JssEnv({"instance_path": str(p)})
    assert (env.jobs, env.machines) == (15, 15)
