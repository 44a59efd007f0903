"""VPU throughput probe: f32 vs bf16 elementwise chains on the real chip.

Answers two questions that gate the pair-kernel optimisation strategy:
  1. What elementwise FLOP rate does XLA actually reach on big fused chains
     (the practical VPU roofline for the slab fold)?
  2. Does bf16 run the VPU any faster than f32 on this chip, i.e. is a
     mixed-precision pair path worth building?

All compute loops run ON DEVICE inside one jit call (the axon tunnel has
~ms dispatch latency; host-looped micro-timings are meaningless).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_vpu.py
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(out.ravel()[0]))
    return (time.perf_counter() - t0) / reps


ROWS, LANES, CHAIN, ITERS = 8192, 128, 64, 100


def make_chain(dtype):
    # ITERS x CHAIN fused multiply-adds: 2*CHAIN*ITERS flops/element
    @jax.jit
    def f(x, y):
        def body(_, acc):
            for _ in range(CHAIN):
                acc = acc * y + x
            return acc

        return lax.fori_loop(0, ITERS, body, x)

    return f


def make_pairlike(dtype):
    """Shape of the real pair math: sub, mul, rsqrt, clamps, selects.
    [B, CAP, W] tiles like the slab fold's pair tensors."""

    @jax.jit
    def f(a, b, c):
        def body(_, acc):
            d0 = a[:, :, None] - b[:, None, :]
            d1 = acc[:, :, None] * 1e-6 - c[:, None, :]
            r2 = d0 * d0 + d1 * d1
            inv_r = lax.rsqrt(jnp.maximum(r2, 1e-12))
            r = r2 * inv_r
            q = jnp.maximum(1.0 - r, 0.0).astype(r.dtype)
            gw = q * q
            s = (d0 + d1) * gw
            return acc + jnp.sum(s * inv_r, axis=2)

        return lax.fori_loop(0, ITERS, body, jnp.zeros_like(a))

    return f


def main():
    results = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = jnp.ones((ROWS, LANES), dtype)
        y = jnp.full((ROWS, LANES), 0.5, dtype)
        f = make_chain(dtype)
        t = timeit(f, x, y)
        flops = ROWS * LANES * 2 * CHAIN * ITERS
        results[f"fma_chain_{name}_tflops"] = round(flops / t / 1e12, 3)

    B, CAP, W = 2048, 32, 128
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        a = jnp.ones((B, CAP), dtype)
        b = jnp.full((B, W), 0.5, dtype)
        c = jnp.full((B, W), 0.25, dtype)
        f = make_pairlike(dtype)
        t = timeit(f, a, b, c)
        # ~13 flop-ish ops per pair element (counting rsqrt as 1)
        ops = B * CAP * W * 13 * ITERS
        results[f"pairlike_{name}_tflops"] = round(ops / t / 1e12, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
