#!/usr/bin/env python
"""Throughput benchmark: batched random-policy env stepping on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "env-steps/s", "vs_baseline": N}

The baseline denominator is the reference implementation's measured single-core
throughput on the same instance (ta01: ~8.4k env-steps/s, BASELINE.md). All
diagnostics go to stderr; stdout carries only the JSON line.

Usage: python bench.py [--instance ta01] [--batch 4096] [--steps 1024]

--instance also accepts a comma list or a range ("ta41-ta50"): the batch then
tiles the instance set round-robin under one jit shape (BASELINE config #4).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# reference throughput on one CPU core, measured in the survey session
# (BASELINE.md "Reference throughput" rows)
REFERENCE_STEPS_PER_S = {"ta01": 8400.0, "ta41": 5900.0, "ta71": 3300.0}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_instances(spec: str):
    """"ta01" | "ta01,ta02" | "ta41-ta50" -> list of names."""
    names = []
    for part in spec.split(","):
        part = part.strip()
        if "-" in part[3:]:
            lo, hi = part.split("-")
            prefix = lo.rstrip("0123456789")
            a, b = int(lo[len(prefix):]), int(hi[len(prefix):])
            names.extend(f"{prefix}{i:0{len(lo)-len(prefix)}d}" for i in range(a, b + 1))
        else:
            names.append(part)
    return names


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--instance", default="ta01")
    # 16384 measured best on one v5e chip (docs/BENCHMARKS.md): launch
    # overheads amortize up to ~16k lanes, VMEM/HBM stay comfortable
    p.add_argument("--batch", type=int, default=int(os.environ.get("JSS_BENCH_BATCH", 16384)))
    # the remote relay charges ~0.15s FIXED dispatch per call; 8192 steps
    # makes the timed section ~1s so the report approaches the chip's
    # intrinsic rate (~148M steps/s on ta01) instead of the dispatch tax
    p.add_argument("--steps", type=int, default=int(os.environ.get("JSS_BENCH_STEPS", 8192)))
    p.add_argument("--repeats", type=int, default=3)
    # deprecated no-op: warmup now always runs the full step count (the
    # round-3 under-warmed-executable fix); accepted so existing automation
    # passing --warmup-steps keeps working (ADVICE r4)
    p.add_argument("--warmup-steps", type=int, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--no-extra", action="store_true",
                   help="skip the ride-along BASELINE config #4 record")
    args = p.parse_args()
    if args.warmup_steps is not None:
        log("--warmup-steps is deprecated and ignored (warmup runs the full "
            "step count)")

    import jax

    # Persistent compilation cache. /root/.cache survives container restarts
    # between rounds (unlike /tmp, which round 2 used and lost — 447s cold
    # compile); a bench run here warms the cache for any later identical run.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except OSError as e:
        log(f"compilation cache unavailable ({e}); compiling cold")

    from jssenv_tpu import instances as inst
    from jssenv_tpu import vector

    backend = jax.default_backend()
    if backend == "cpu" and "JSS_BENCH_BATCH" not in os.environ:
        # CPU fallback (no chip attached): keep the run short
        args.batch = min(args.batch, 512)
        args.steps = min(args.steps, 256)
    log(f"backend={backend} devices={jax.devices()}")

    def run_config(instance_spec, batch, steps):
        """Measure one (instance set, batch) config; returns a record dict.

        Single-instance configs on TPU run the fused Pallas rollout kernel
        (the whole auto-resetting rollout in one launch, VMEM-resident
        state; jssenv_tpu.core.pallas_rollout) — every completed episode is
        identity-checked on device, and the run aborts if any violation is
        reported. Ragged instance sets and CPU runs take the XLA scan path.
        """
        log(f"instance={instance_spec} batch={batch} steps={steps}")
        names = parse_instances(instance_spec)
        if len(names) == 1:
            source = inst.get_instance(names[0])
        else:
            source = inst.get_instance_set(names)
        state = vector.make_batch(source, batch)

        engine_name = "xla"
        if backend != "cpu":
            try:
                from jssenv_tpu.core import pallas_rollout

                pallas_rollout._group_lanes(state, 1)  # feasibility only
                engine_name = "pallas"
            except (ImportError, ValueError) as e:
                log(f"pallas path unavailable ({e}); using XLA scan")

        def run(seed, n_steps):
            """-> (episodes, total_makespan, min_makespan, violations)."""
            if engine_name == "pallas":
                st = pallas_rollout.rollout_free(state, n_steps, seed=seed)
                st = {k: jax.device_get(v) for k, v in st.items()}
                return (
                    int(st["episodes"]),
                    int(st["total_makespan"]),
                    int(st["min_makespan"]),
                    int(st["identity_violations"]),
                )
            # NOTE: timing must end with a device_get of the (tiny) stats,
            # not block_until_ready — on the remote-relay TPU backend the
            # first block_until_ready after a fresh executable can return
            # without actually forcing the computation, which silently
            # inflates throughput numbers.
            _, st = vector.rollout(
                jax.random.key(seed), state, num_steps=n_steps
            )
            st = jax.device_get(st)
            return (
                int(st.episodes),
                int(st.total_makespan),
                int(st.min_makespan),
                0,
            )

        # Warm up with the SAME step count as the timed runs: num_steps is a
        # static arg in both the Pallas kernel and the XLA scan, so warming at
        # a smaller count would leave the full-length executable to compile
        # inside timed repeat 0 (ADVICE r3).
        t0 = time.time()
        run(0, steps)
        warmup_s = time.time() - t0
        log(f"compile+warmup ({engine_name}, {steps} steps): {warmup_s:.1f}s")

        best = 0.0
        for r in range(args.repeats):
            try:
                t0 = time.time()
                eps, mk_sum, mk_min, viol = run(r + 1, steps)
                dt = time.time() - t0
            except jax.errors.JaxRuntimeError as e:  # flaky device/tunnel
                log(f"repeat {r}: device error ({e}); continuing")
                continue
            if viol:
                raise RuntimeError(
                    f"on-device reward-identity violations: {viol}"
                )
            sps = batch * steps / dt
            avg_ms = mk_sum / eps if eps else float("nan")
            log(
                f"repeat {r}: {sps:,.0f} env-steps/s ({dt:.2f}s, {eps} episodes, "
                f"avg makespan {avg_ms:.0f}, min {mk_min})"
            )
            best = max(best, sps)

        ref = REFERENCE_STEPS_PER_S.get(
            names[0], REFERENCE_STEPS_PER_S["ta01"]
        )
        return {
            "metric": f"env-steps/s per chip, batched {instance_spec}, random policy",
            "value": round(best, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(best / ref, 2),
            "backend": backend,
            "engine": engine_name,
            "batch": batch,
            "steps": steps,
            "warmup_s": round(warmup_s, 1),
        }

    record = run_config(args.instance, args.batch, args.steps)

    # Extra configs ride along as nested records so stdout stays ONE JSON
    # line for the driver: BASELINE config #4 (ragged ta41-ta50; 10240 = 10
    # instances x 1024 lanes, equal instance-major groups) and the largest
    # reference family (ta71, 100x20 — the kernel's small-tile regime).
    if args.instance == "ta01" and backend != "cpu" and not args.no_extra:
        record["extra"] = []
        for spec_, batch_ in (("ta41-ta50", 10240), ("ta71", 8192)):
            try:
                record["extra"].append(run_config(spec_, batch_, args.steps))
            except Exception as e:  # never let an extra sink the primary
                log(f"extra config {spec_} failed: {e}")

    print(json.dumps(record))


if __name__ == "__main__":
    main()
