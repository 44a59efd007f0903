import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, numpy as np
from sph_pie_tpu.scenes import dam_break_2d, dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned

def sync(b):
    return float(np.asarray(b.travel))  # real host fence (axon quirk)

for scene, steps in ((dam_break_2d(4096), 2000), (dam_break_3d(100_000), 200), (dam_break_3d(1_000_000), 20)):
    g = scene.bgrid
    b = scene.binned_state()
    b = wcsph_binned.simulate(scene.params, g, b, 2)
    sync(b)
    t0=time.time()
    b = wcsph_binned.simulate(scene.params, g, b, steps)
    sync(b)
    w = time.time()-t0
    n = int(scene.state.n_active())
    print(f"{scene.name} N={n} cells={g.num_cells} cap={g.cap}: {w/steps*1e3:.2f} ms/step -> {n*steps/w:.3g} ps/s overflow={int(b.overflow)}", flush=True)
