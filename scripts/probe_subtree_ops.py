"""HW probe: Mosaic constructs needed by the fused coarse-subtree V-cycle
kernel, at the exact shapes it will use (64^3 wrap level and below).

  a. jnp.roll on all three axes of a (64, 64, 64) VMEM value (z = lane
     dim with sub-128 extent).
  b. x-subsample via reshape (X,Y,Z)->(X/2,2,Y,Z)[:,0] (untiled dims,
     layout-free; a [::2] strided slice lowers to an unsupported gather).
  c. per-row dots: (Yc,Y) @ (Y,Z) and (Y,Z) @ (Z,Zc) pick contractions.
  d. fori_loop with dynamic untiled-axis scratch ref indexing.
  e. (variant B) whole-array einsum contractions over y then z.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = Y = Z = 64
Yc = Zc = 32

MODE = sys.argv[1] if len(sys.argv) > 1 else "loop"


def xdot(a, b):
    """a @ b exact on the bf16 MXU: 3-term bf16 split of the DATA side
    (the pick/weight side is exactly representable)."""
    h1 = a.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = a - h1
    h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    h3 = r1 - h2
    return (
        jnp.dot(h1, b, preferred_element_type=jnp.float32)
        + jnp.dot(h2, b, preferred_element_type=jnp.float32)
        + jnp.dot(h3, b, preferred_element_type=jnp.float32)
    )


def kernel(v_ref, py_ref, pz_ref, o_ref, scratch, cscr):
    v = v_ref[:]
    r = (
        jnp.roll(v, 1, axis=0)
        + jnp.roll(v, -1, axis=1)
        + jnp.roll(v, 1, axis=2)
        + jnp.roll(v, -1, axis=2)
    )
    sub = r.reshape(X // 2, 2, Y, Z)[:, 0]
    py = py_ref[:]
    pz = pz_ref[:]
    if MODE == "einsum":
        def xeinsum(spec, m, a):
            h1 = a.astype(jnp.bfloat16).astype(jnp.float32)
            r1 = a - h1
            h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
            h3 = r1 - h2
            return sum(
                jnp.einsum(spec, m, h, preferred_element_type=jnp.float32)
                for h in (h1, h2, h3)
            )

        t = xeinsum("cY,xYZ->xcZ", py, sub)
        o_ref[:] = xeinsum("dZ,xcZ->xcd", pz.T, t)
        return
    scratch[:] = sub

    def body(i, _):
        row = scratch[i]
        # left dot: split data (row); transpose trick keeps data on the left
        t = xdot(row.T, py.T).T
        cscr[i] = xdot(t, pz)
        return 0

    lax.fori_loop(0, X // 2, body, 0)
    o_ref[:] = cscr[:]


call = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((X // 2, Yc, Zc), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[
        pltpu.VMEM((X // 2, Y, Z), jnp.float32),
        pltpu.VMEM((X // 2, Yc, Zc), jnp.float32),
    ],
)

rng = np.random.default_rng(3)
v = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
py_np = np.zeros((Yc, Y), np.float32)
py_np[np.arange(Yc), 2 * np.arange(Yc)] = 1.0
pz_np = np.zeros((Z, Zc), np.float32)
pz_np[2 * np.arange(Zc), np.arange(Zc)] = 1.0
got = np.asarray(call(v, jnp.asarray(py_np), jnp.asarray(pz_np)))

vn = np.asarray(v)
r = (
    np.roll(vn, 1, axis=0)
    + np.roll(vn, -1, axis=1)
    + np.roll(vn, 1, axis=2)
    + np.roll(vn, -1, axis=2)
)
want = r[::2][:, ::2, ::2]
err = np.abs(got - want).max()
print(f"probe[{MODE}] max err:", err)
assert err < 1e-5, "MISMATCH"
print(f"PASS[{MODE}]")
