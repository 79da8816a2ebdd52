"""Measure the VPU elementwise-op throughput peak on the live chip.

The roofline model's VPU_F32_OPS_PER_S was a spec-sheet guess
(4 ALUs x 8x128 lanes x 0.94 GHz); BENCH_r04's 129^3 row measured
116.6% of the model bound built on it, i.e. the constant understates
the hardware (VERDICT r4 weak #3).  This probe times a VMEM-resident
Pallas kernel running K iterations of an elementwise op chain over a
(512, 128) f32 block — 64 vregs of independent per-vreg work per
iteration, far above the ALU latency-bandwidth product, so the loop is
throughput-bound.  Two trip counts cancel the dispatch latency.

Op kinds: fma (v*a+b — one VPU op if the ALU fuses), add, mul.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (512, 128)
ELEMS = SHAPE[0] * SHAPE[1]


def make(kind, iters, dtype=jnp.float32):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def body(i, v):
            if kind == "fma":
                return v * a + b
            if kind == "add":
                return v + a
            if kind == "mul":
                return v * a
            raise ValueError(kind)

        o_ref[:] = lax.fori_loop(0, iters, body, b)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def run(kind, iters, dtype=jnp.float32, reps=3):
    rng = np.random.default_rng(1)
    a = jnp.asarray(
        1.0 + 1e-6 * rng.standard_normal(SHAPE), dtype
    )  # keep the chain finite
    b = jnp.asarray(1e-6 * rng.standard_normal(SHAPE), dtype)
    fn = jax.jit(make(kind, iters))
    out = fn(a, b)
    float(out[0, 0].astype(jnp.float32))  # force completion
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(a, b)
        float(out[0, 0].astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dt = jnp.float32
    hi, lo = 2_000_000, 250_000
    if len(sys.argv) > 1 and sys.argv[1] == "bf16":
        dt = jnp.bfloat16
    for kind in ("fma", "add", "mul"):
        t_hi = run(kind, hi, dt)
        t_lo = run(kind, lo, dt)
        per_iter = (t_hi - t_lo) / (hi - lo)
        ops = ELEMS / per_iter
        print(
            f"{kind:>4} {np.dtype(dt).name}: t_hi={t_hi*1e3:.1f}ms "
            f"t_lo={t_lo*1e3:.1f}ms -> {ops:.3e} elementwise ops/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
