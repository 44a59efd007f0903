import time, jax, jax.numpy as jnp
print("waiting for device...", flush=True)
t0 = time.time()
x = jnp.ones((8,8)); jax.block_until_ready(x + 1)
print(f"device ok after {time.time()-t0:.0f}s", flush=True)
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned
t0=time.time()
scene = dam_break_3d(1_000_000)
g = scene.bgrid
print(f"scene built {time.time()-t0:.1f}s N={int(scene.state.n_active())} cells={g.num_cells} cap={g.cap} slots={g.num_slots/1e6:.1f}M block={g.block_cells}", flush=True)
t0=time.time()
b = scene.binned_state(); jax.block_until_ready(b.pos)
print(f"bin {time.time()-t0:.1f}s overflow={int(b.overflow)}", flush=True)
t0=time.time()
b = wcsph_binned.simulate(scene.params, g, b, 1); jax.block_until_ready(b.pos)
print(f"compile+1 {time.time()-t0:.1f}s", flush=True)
t0=time.time()
b = wcsph_binned.simulate(scene.params, g, b, 10); jax.block_until_ready(b.pos)
w = time.time()-t0
print(f"10 steps {w:.1f}s -> {w/10*1e3:.0f} ms/step -> {int(scene.state.n_active())*10/w:.3g} ps/s overflow={int(b.overflow)}", flush=True)
print("DONE", flush=True)
