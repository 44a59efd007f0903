"""Microbench rebin components on the real TPU: sort variants, gathers, scatters."""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 995_328
NUM_CELLS = 304_426


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0]))


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


key = jax.random.PRNGKey(0)
cid = jax.random.randint(key, (N,), 0, NUM_CELLS, dtype=jnp.int32)
# nearly-sorted variant (typical rebin input: mostly already in cell order)
cid_sorted = jnp.sort(cid)
noise = jax.random.randint(jax.random.PRNGKey(1), (N,), -2, 3, dtype=jnp.int32)
cid_nearly = jnp.clip(cid_sorted + noise * (jax.random.uniform(jax.random.PRNGKey(2), (N,)) < 0.25), 0, NUM_CELLS)
rows = jax.random.normal(jax.random.PRNGKey(3), (N, 8), jnp.float32)
perm = jax.random.permutation(jax.random.PRNGKey(4), N).astype(jnp.int32)

bench("argsort_stable_1m", jax.jit(lambda c: jnp.argsort(c)), cid)
bench("argsort_unstable_1m", jax.jit(lambda c: jnp.argsort(c, stable=False)), cid)
bench("argsort_unstable_nearly_sorted", jax.jit(lambda c: jnp.argsort(c, stable=False)), cid_nearly)
bench("argsort_unstable_256k", jax.jit(lambda c: jnp.argsort(c, stable=False)), cid[: N // 4])
bench("sort_1m_keys_only", jax.jit(lambda c: jnp.sort(c, stable=False)), cid)
bench(
    "sort_key_plus_8payload",
    jax.jit(
        lambda c, r: jax.lax.sort(
            (c,) + tuple(r[:, i] for i in range(8)), num_keys=1
        )[0]
    ),
    cid,
    rows,
)
bench("gather_1m_x8", jax.jit(lambda r, p: r[p]), rows, perm)
bench(
    "scatter_1m_x8",
    jax.jit(lambda r, p: jnp.zeros((N + 64, 8), jnp.float32).at[p].set(r)),
    rows,
    perm,
)
bench("searchsorted_1m", jax.jit(lambda c: jnp.searchsorted(c, c)), cid_sorted)
bench(
    "scatteradd_counts",
    jax.jit(lambda c: jnp.zeros((NUM_CELLS + 1,), jnp.int32).at[c].add(1)),
    cid,
)
# two-level idea: segment ids already grouped in 128-particle chunks ->
# per-chunk small sorts via vmap
bench(
    "vmapped_chunk_sort_8k_x128",
    jax.jit(lambda c: jax.vmap(lambda x: jnp.sort(x, stable=False))(c.reshape(7776, 128))),
    cid,
)
print("done", flush=True)
