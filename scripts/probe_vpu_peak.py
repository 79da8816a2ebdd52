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

def make(kind, iters, shape, nacc, dtype=jnp.float32):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def op(v):
            if kind == "fma":
                return v * a + b
            if kind == "add":
                return v + a
            if kind == "mul":
                return v * a
            raise ValueError(kind)

        def body(i, vs):
            return tuple(op(v) for v in vs)

        vs = lax.fori_loop(
            0, iters, body, tuple(b + k for k in range(nacc))
        )
        out = vs[0]
        for v in vs[1:]:
            out = out + v
        o_ref[:] = out

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def run(kind, iters, shape, nacc, dtype=jnp.float32, reps=3):
    rng = np.random.default_rng(1)
    a = jnp.asarray(
        1.0 + 1e-6 * rng.standard_normal(shape), dtype
    )  # keep the chain finite
    b = jnp.asarray(1e-6 * rng.standard_normal(shape), dtype)
    fn = jax.jit(make(kind, iters, shape, nacc))
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
    if len(sys.argv) > 1 and sys.argv[1] == "bf16":
        dt = jnp.bfloat16
    for shape, nacc, hi in (
        ((512, 128), 1, 2_000_000),
        ((128, 128), 4, 2_000_000),
        ((64, 128), 8, 2_000_000),
        ((1024, 128), 1, 1_000_000),
    ):
        elems = shape[0] * shape[1] * nacc
        lo = hi // 8
        for kind in ("fma", "add"):
            t_hi = run(kind, hi, shape, nacc, dt)
            t_lo = run(kind, lo, shape, nacc, dt)
            per_iter = (t_hi - t_lo) / (hi - lo)
            ops = elems / per_iter
            print(
                f"{kind:>4} {np.dtype(dt).name} shape={shape} "
                f"nacc={nacc}: t_hi={t_hi*1e3:.1f}ms "
                f"t_lo={t_lo*1e3:.1f}ms -> {ops:.3e} ops/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
