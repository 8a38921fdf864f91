"""Mosaic legality probe: int8 MXU dot path for the W4 GEMV.

STATUS.md round-3 bytes accounting says the next speed step past the
Mosaic-legal int32-widen unpack is "an int8 MXU dot path (future)".
This probe answers the two gating legality questions on the attached
target before any kernel work:

  P1  int32 -> int8 narrowing cast inside a kernel (the unpack must land
      nibbles in int8 registers for the MXU int8 path to see them)
  P2  jnp.dot(int8, int8, preferred_element_type=int32) — the int8 MXU
      systolic path at GEMV-ish shapes

Each probe compiles + runs one minimal kernel and checks exact integer
results. Prints PROBE_OK / PROBE_FAIL per item plus timing of the int8
dot vs the bf16 dot at the W4 GEMV inner shape.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, fn):
    try:
        out = fn()
        print(f"PROBE_OK   {name}: {out}")
        return True
    except Exception as e:  # noqa: BLE001 - legality probe, report everything
        msg = str(e).splitlines()[0][:160]
        print(f"PROBE_FAIL {name}: {type(e).__name__}: {msg}")
        return False


def probe_narrow_cast():
    # int32 mask/shift unpack (the known-legal route) then cast to int8
    def kernel(x_ref, o_ref):
        v = x_ref[:].astype(jnp.int32)
        lo = jnp.bitwise_and(v, 15)
        o_ref[:] = lo.astype(jnp.int8)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int8),
    )(x)
    expect = (np.arange(8 * 128, dtype=np.int32).reshape(8, 128) & 15).astype(np.int8)
    assert np.array_equal(np.asarray(out), expect)
    return "int32->int8 cast legal, values exact"


def probe_int8_dot():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    rng = np.random.default_rng(0)
    a = rng.integers(-8, 8, (8, 256), dtype=np.int8)
    b = rng.integers(-8, 8, (256, 128), dtype=np.int8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(jnp.asarray(a), jnp.asarray(b))
    expect = a.astype(np.int32) @ b.astype(np.int32)
    assert np.array_equal(np.asarray(out), expect)
    return "int8xint8->int32 MXU dot legal, exact"


def probe_fused_unpack_int8_dot():
    """The actual shape of interest: unpack u8 nibbles -> int8, int8 dot."""

    def kernel(x_ref, w_ref, o_ref):
        w = w_ref[:].astype(jnp.int32)
        lo = jnp.bitwise_and(w, 15) - 8
        hi = jnp.bitwise_and(jax.lax.shift_right_logical(w, 4), 15) - 8
        q = jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    rng = np.random.default_rng(1)
    S, O = 256, 512
    w = rng.integers(0, 256, (S // 2, O), dtype=np.uint8)
    x = rng.integers(-127, 127, (8, S), dtype=np.int8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, O), jnp.int32),
    )(jnp.asarray(x), jnp.asarray(w))
    lo = (w.astype(np.int32) & 15) - 8
    hi = ((w.astype(np.int32) >> 4) & 15) - 8
    q = np.concatenate([lo, hi], axis=0)
    expect = x.astype(np.int32) @ q
    assert np.array_equal(np.asarray(out), expect)
    return "fused u8-unpack -> int8 MXU dot legal, exact"


def bench_dots():
    """int8 vs bf16 dot at the W4 GEMV inner geometry (S=4096, O=4096)."""
    S = O = 4096

    def mk(dtype, acc):
        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, O), acc))

    rng = np.random.default_rng(2)
    a8 = jnp.asarray(rng.integers(-8, 8, (8, S), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-8, 8, (S, O), dtype=np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    f8 = jax.jit(mk(jnp.int8, jnp.int32))
    fbf = jax.jit(mk(jnp.bfloat16, jnp.float32))
    f8(a8, b8).block_until_ready()
    fbf(abf, bbf).block_until_ready()
    reps = 50
    best8 = bestbf = 1e9
    for _ in range(5):
        t = time.perf_counter()
        for _ in range(reps):
            o = f8(a8, b8)
        o.block_until_ready()
        best8 = min(best8, (time.perf_counter() - t) / reps)
        t = time.perf_counter()
        for _ in range(reps):
            o = fbf(abf, bbf)
        o.block_until_ready()
        bestbf = min(bestbf, (time.perf_counter() - t) / reps)
    return f"int8 dot {best8*1e6:.1f}us vs bf16 dot {bestbf*1e6:.1f}us @ {S}x{O} M=8"


if __name__ == "__main__":
    print("devices:", jax.devices())
    ok1 = _run("narrow_cast(int32->int8)", probe_narrow_cast)
    ok2 = _run("int8_mxu_dot", probe_int8_dot)
    ok3 = _run("fused_unpack_int8_dot", probe_fused_unpack_int8_dot)
    if ok2:
        _run("bench int8 vs bf16 dot", bench_dots)
