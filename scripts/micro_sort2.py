"""Round 2: scatter/gather variants + rank-via-cummax for the rebin redesign."""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 995_328
NUM_CELLS = 304_426
S = NUM_CELLS * 32


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


k0 = jax.random.PRNGKey(0)
cid = jnp.sort(jax.random.randint(k0, (N,), 0, NUM_CELLS, dtype=jnp.int32))
col = jax.random.normal(jax.random.PRNGKey(3), (N,), jnp.float32)
perm = jax.random.permutation(jax.random.PRNGKey(4), N).astype(jnp.int32)
sorted_idx = jnp.sort(
    jax.random.permutation(jax.random.PRNGKey(5), S).astype(jnp.int32)[:N]
)
big = jax.random.normal(jax.random.PRNGKey(6), (S,), jnp.float32)
valid = jnp.zeros((S,), jnp.bool_).at[sorted_idx].set(True)

bench("gather_col_unsorted", jax.jit(lambda c, p: c[p]), col, perm)
bench(
    "gather_col_sorted_flag",
    jax.jit(lambda b, i: b.at[i].get(indices_are_sorted=True, unique_indices=True)),
    big,
    sorted_idx,
)
bench(
    "gather_col_sorted_noflag",
    jax.jit(lambda b, i: b[i]),
    big,
    sorted_idx,
)
bench(
    "scatter_col_unsorted",
    jax.jit(lambda c, p: jnp.zeros((N + 64,), jnp.float32).at[p].set(c)),
    col,
    perm,
)
bench(
    "scatter_col_sorted_flags",
    jax.jit(
        lambda c, i: jnp.zeros((S,), jnp.float32).at[i].set(
            c, indices_are_sorted=True, unique_indices=True, mode="drop"
        )
    ),
    col,
    sorted_idx,
)
bench(
    "scatter_col_sorted_noflags",
    jax.jit(lambda c, i: jnp.zeros((S,), jnp.float32).at[i].set(c, mode="drop")),
    col,
    sorted_idx,
)
bench(
    "rank_via_cummax",
    jax.jit(
        lambda c: jnp.arange(N, dtype=jnp.int32)
        - jax.lax.associative_scan(
            jnp.maximum,
            jnp.where(
                jnp.concatenate([jnp.array([True]), c[1:] != c[:-1]]),
                jnp.arange(N, dtype=jnp.int32),
                0,
            ),
        )
    ),
    cid,
)
bench(
    "cumsum_9m_int",
    jax.jit(lambda v: jnp.cumsum(v.astype(jnp.int32))),
    valid,
)
bench(
    "nonzero_9m_sizeN",
    jax.jit(lambda v: jnp.nonzero(v, size=N, fill_value=S - 1)[0]),
    valid,
)
# full fused candidate: multi-operand sort 1 key + 8 payloads incl int32
ops = (cid,) + tuple(
    jax.random.normal(jax.random.PRNGKey(10 + i), (N,), jnp.float32) for i in range(7)
) + (perm,)
bench(
    "sort_key_7f32_1i32",
    jax.jit(lambda *o: jax.lax.sort(o, num_keys=1)[0]),
    *ops,
)
print("done", flush=True)
