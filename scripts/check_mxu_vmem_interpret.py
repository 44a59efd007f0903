"""CPU interpret-mode parity check for scripts/micro_mxu_vmem.py's kernel.

Runs the VMEM-fused weights+dot forces kernel (MXU route) in Pallas
interpret mode at tiny N and compares against the XLA fold — catches
semantics bugs before a hardware session is spent on them (Mosaic
compile errors still only surface on the real chip).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/check_mxu_vmem_interpret.py
"""

import os as _os, sys as _sys  # bare-runnable: repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from micro_mxu_vmem import forces_mxu

from sph_pie_tpu.kernels import eos
from sph_pie_tpu.scenes import dam_break_3d
from sph_pie_tpu.solvers import wcsph_binned
from sph_pie_tpu.utils.struct import replace


def main():
    scene = dam_break_3d(
        1500, skin_frac=0.25, bcap=32, surface_tension=0.0, xsph_eps=0.05
    )
    params, grid = scene.params, scene.bgrid
    b = scene.binned_state()
    b = wcsph_binned.simulate(params, grid, b, 10)
    rho = wcsph_binned._density(params, grid, b)
    b = replace(b, density=rho, pressure=eos.tait_pressure(params, rho))

    ref_acc, ref_xs = wcsph_binned._forces(params, grid, b)
    ref_acc, ref_xs = np.asarray(ref_acc), np.asarray(ref_xs)
    valid = np.asarray(b.valid)
    acc, xs = forces_mxu(params, grid, b, interpret=True)
    acc, xs = np.asarray(acc), np.asarray(xs)
    sa = float(np.abs(ref_acc[valid]).max())
    sx = float(np.abs(ref_xs[valid]).max())
    ea = float(np.abs(acc[valid] - ref_acc[valid]).max() / sa)
    ex = float(np.abs(xs[valid] - ref_xs[valid]).max() / max(sx, 1e-30))
    print(f"acc rel err {ea:.3e}  xsph rel err {ex:.3e}")
    assert ea < 5e-5 and ex < 5e-5, "interpret parity FAILED"
    print("interpret parity OK")


if __name__ == "__main__":
    main()
