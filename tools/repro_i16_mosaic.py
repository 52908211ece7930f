#!/usr/bin/env python
"""Minimal repro: int16 Pallas kernels CHECK-crash Mosaic on TPU v5e.

The jssenv_tpu fused rollout kernel has a complete int16 mode
(core/pallas_rollout.value_dtype, gated behind JSS_PALLAS_INT16=1,
interpret-differential-tested) that would halve vector-register traffic for
instance families whose arithmetic fits 16 bits. It cannot ship because the
toolchain (jax 0.9.0 era, v5e) aborts compiling ANY int16 kernel — including
this one-op one:

    F layout.h:320] Check failed: arr.size() >= layout_rank(implicit_dim) (1 vs. 2)
    *** SIGABRT received ***

Verified 2026-08-21 (round 4): the identical 8-line kernel below crashes the
TPU compile helper (SIGABRT inside Mosaic's infer-vector-layout pass), so the
blocker is NOT any specific op pattern in the rollout kernel — no kernel
restructuring can dodge it. int32 and bfloat16 variants of the same kernel
compile and run fine (verified in the same session). Retest on every jax/libtpu bump by running this file on a TPU
host; when it prints OK, flip JSS_PALLAS_INT16=1 and re-run bench.py.

Note: on deployments where compilation happens in a helper subprocess (e.g.
the axon relay), the crash surfaces as a recoverable JaxRuntimeError
("tpu_compile_helper subprocess exit signal SIGABRT"); on a local libtpu it
aborts the calling process — run this in a subprocess if that matters.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * jnp.int16(2)


def main() -> int:
    x = jnp.asarray(np.arange(8 * 128, dtype=np.int16).reshape(8, 128) % 7)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16)
    )(x)
    print("int16 pallas kernel compiled and ran OK:", int(out.sum()))
    print("-> the Mosaic int16 blocker is FIXED on this toolchain; "
          "try JSS_PALLAS_INT16=1 with bench.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
