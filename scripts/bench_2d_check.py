import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, jax, numpy as np
from sph_pie_tpu.scenes import dam_break_2d
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.neighbors import binned as nb

scene = dam_break_2d(4096)
g = scene.bgrid
b = scene.binned_state()
b = wcsph_binned.simulate(scene.params, g, b, 2)
jax.block_until_ready(b.pos)
print("warm done, cap", g.cap, flush=True)
for steps in (500, 2000):
    t0=time.time()
    b2 = wcsph_binned.simulate(scene.params, g, b, steps)
    jax.block_until_ready(b2.pos)
    w = time.time()-t0
    st = nb.unbin(g, b2, scene.state.capacity)
    pos = np.asarray(st.pos)[np.asarray(st.active)]
    print(f"{steps} steps: {w:.3f}s ({w/steps*1e3:.3f} ms/step) overflow={int(b2.overflow)} com={pos.mean(0)}", flush=True)
