"""Dev differential harness: stepwise state parity vs the reference env.

Drives the reference JssEnv and the new jitted core with identical action
sequences and asserts every state field matches after every step.
"""
import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"

# stub plotly (not installed here) before importing the reference
for name in ["plotly", "plotly.figure_factory", "plotly.graph_objects"]:
    if name not in sys.modules:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
sys.modules["plotly"].figure_factory = sys.modules["plotly.figure_factory"]
sys.modules["plotly.graph_objects"].Figure = object

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from JSSEnv.envs.jss_env import JssEnv  # reference
from jssenv_tpu import instances as inst
from jssenv_tpu.core import engine


def compare(ref, state, step_i, ctx):
    nj, nm = ref.jobs, ref.machines
    s = jax.device_get(state)
    checks = {
        "time": (ref.current_time_step, int(s.time)),
        "nb_legal": (ref.nb_legal_actions, int(s.nb_legal)),
        "nb_machine_legal": (ref.nb_machine_legal, int(s.nb_machine_legal)),
    }
    for k, (a, b) in checks.items():
        assert a == b, f"step {step_i} [{ctx}]: {k} ref={a} new={b}"
    arr_checks = {
        "legal": (ref.legal_actions[:nj], np.asarray(s.legal)[:nj]),
        "noop_legal": (ref.legal_actions[nj], bool(s.noop_legal)),
        "machine_legal": (ref.machine_legal, np.asarray(s.machine_legal)[:nm]),
        "solution": (ref.solution, np.asarray(s.solution)[:nj, :nm]),
        "tua": (ref.time_until_available_machine, np.asarray(s.machine_busy_for)[:nm]),
        "tuf": (ref.time_until_finish_current_op_jobs, np.asarray(s.job_busy_for)[:nj]),
        "todo": (ref.todo_time_step_job, np.asarray(s.next_op)[:nj]),
        "work_done": (ref.total_perform_op_time_jobs, np.asarray(s.work_done)[:nj]),
        "needed": (ref.needed_machine_jobs, np.asarray(s.needed_machine)[:nj]),
        "idle_total": (ref.total_idle_time_jobs, np.asarray(s.idle_total)[:nj]),
        "idle_since": (ref.idle_time_jobs_last_op, np.asarray(s.idle_since_op)[:nj]),
        "pin": (ref.illegal_actions, np.asarray(s.pin)[:nm, :nj]),
        "noop_pin": (ref.action_illegal_no_op, np.asarray(s.noop_pin)[:nj]),
    }
    for k, (a, b) in arr_checks.items():
        a = np.asarray(a)
        b = np.asarray(b)
        if not np.array_equal(a, b):
            idx = np.argwhere(a != b)
            raise AssertionError(
                f"step {step_i} [{ctx}]: {k} mismatch at {idx[:5]}\nref={a}\nnew={b}"
            )
    # obs: float comparison (col 0 is written lazily by the obs assembler in
    # both implementations, so compare the assembled observation)
    ref_obs = np.asarray(ref._get_current_state_representation()["real_obs"], dtype=np.float64)
    new_obs = np.asarray(jax.device_get(state.observation()["real_obs"]), dtype=np.float64)[:nj]
    if not np.allclose(ref_obs, new_obs, atol=1e-6):
        idx = np.argwhere(~np.isclose(ref_obs, new_obs, atol=1e-6))
        raise AssertionError(f"step {step_i} [{ctx}]: obs mismatch at {idx[:5]}")
    # reconstructed event queue
    busy = np.asarray(s.machine_busy_for)[:nm]
    q = sorted(set(int(s.time) + t for t in busy[busy > 0]))
    assert list(ref.next_time_step) == q, (
        f"step {step_i} [{ctx}]: queue ref={ref.next_time_step} new={q}"
    )


def run(name, episodes=3, seed=0, pad=(0, 0)):
    spec = inst.get_instance(name)
    ref = JssEnv({"instance_path": f"/root/reference/JSSEnv/envs/instances/{name}"})
    step = jax.jit(engine.step)
    rng = np.random.default_rng(seed)
    for ep in range(episodes):
        ref.reset()
        state = engine.state_from_spec(spec, jobs_pad=pad[0], machines_pad=pad[1])
        compare(ref, state, -1, f"{name} ep{ep} reset")
        done = False
        i = 0
        while not done:
            mask = np.asarray(ref.legal_actions, dtype=np.float64)
            a = rng.choice(len(mask), p=mask / mask.sum())
            a_new = int(state.num_jobs) if a == ref.jobs else int(a)
            _, r_ref, done, _, _ = ref.step(int(a))
            state, tr = step(state, a_new)
            raw_ref = round(r_ref * ref.max_time_op)
            assert raw_ref == int(tr.raw_reward), (
                f"step {i}: reward ref_raw={raw_ref} new={int(tr.raw_reward)}"
            )
            assert done == bool(tr.done), f"step {i}: done ref={done} new={bool(tr.done)}"
            compare(ref, state, i, f"{name} ep{ep}")
            i += 1
        print(f"{name} ep{ep}: parity OK over {i} steps, makespan {ref.current_time_step}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["ta01"]
    for n in names:
        run(n)
    # padded-lane check: same episodes with extra padding must be bit-identical
    run("ta01", episodes=1, seed=0, pad=(32, 24))
    print("ALL PARITY CHECKS PASSED")
