"""Decompose the 2D color-split sweep body's on-chip cost (VMEM-resident,
no DMA): which of {sublane roll (E), lane roll+select (S), mask blend,
coefficient streams} eats the 43%-of-roofline gap on the Lyapunov leg.

Variants (all f_zero, Lyapunov semantics, (ext, Y2p) block):
  base    : exact make_split_color_slab_2d body (rolls + select + blend)
  fold    : mask/boundary folded into streams -> r = Ae*E + As*S + C
            (no old-r read, no blend; Dirichlet rows/lanes carried by C)
  noselect: S neighbor without the parity select (numerics wrong; cost bound)
  noroll  : E without the sublane roll          (numerics wrong; cost bound)
  floor   : r = Ae*b + C                        (pure stream floor)

Interleaved same-process A/B per the CLAUDE.md measurement protocol.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EXT = int(sys.argv[1]) if len(sys.argv) > 1 else 128
Y2P = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
# two-point fit: slope between K1 and K2 sweeps/call cancels the ~25 ms
# tunnel dispatch latency (CLAUDE.md measurement protocol)
K1, K2 = 4096, 16384
REPS = 6


def make(variant, K):
    def kernel(rv, bv, aer, asr, cr, aeb, asb, cb, ro, bo):
        q1 = (lax.broadcasted_iota(jnp.int32, (EXT, 1), 0) % 2) == 1

        def rl(a, s):
            return jnp.roll(a, -s, axis=1)

        def e_of(o):
            return o if variant == "noroll" else jnp.roll(o, -1, axis=0)

        def s_of(o, q):
            if variant in ("noselect", "noroll", "floor"):
                return o
            return jnp.where(q, rl(o, 1), o)

        m_r = (q1 | True).astype(jnp.float32)  # stand-in masks (base only)
        m_b = m_r

        def one(_, rb):
            r, b = rb
            if variant == "base":
                upd = aer[...] * e_of(b) + asr[...] * s_of(b, q1)
                r = r + m_r * (upd - r)
                upd = aeb[...] * e_of(r) + asb[...] * s_of(
                    r, jnp.logical_not(q1)
                )
                b = b + m_b * (upd - b)
            elif variant == "floor":
                r = aer[...] * b + cr[...]
                b = aeb[...] * r + cb[...]
            else:  # fold / noselect / noroll
                r = aer[...] * e_of(b) + asr[...] * s_of(b, q1) + cr[...]
                b = aeb[...] * e_of(r) + asb[...] * s_of(
                    r, jnp.logical_not(q1)
                ) + cb[...]
            return r, b

        r, b = lax.fori_loop(0, K, one, (rv[...], bv[...]))
        ro[...] = r
        bo[...] = b

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((EXT, Y2P), jnp.float32),
            jax.ShapeDtypeStruct((EXT, Y2P), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )


def main():
    rng = np.random.default_rng(3)
    arrs = [
        jnp.asarray(
            rng.standard_normal((EXT, Y2P)) * 0.01, jnp.float32
        )
        for _ in range(8)
    ]
    variants = ["base", "fold", "noselect", "noroll", "floor"]
    fns = {}
    for v in variants:
        for K in (K1, K2):
            f = jax.jit(make(v, K))
            out = f(*arrs)
            jax.block_until_ready(out)
            float(out[0][1, 1])
            fns[v, K] = f
    points = EXT * Y2P * 2  # both colors

    def timed(v, K):
        t0 = time.perf_counter()
        out = fns[v, K](*arrs)
        float(out[0][1, 1])
        return time.perf_counter() - t0

    for round_i in range(REPS):
        line = []
        for v in variants:
            t1, t2 = timed(v, K1), timed(v, K2)
            per_sweep = (t2 - t1) / (K2 - K1)
            ups = points / per_sweep
            line.append(
                f"{v}: {per_sweep*1e6:6.2f}us {ups/1e11:.2f}e11"
            )
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
