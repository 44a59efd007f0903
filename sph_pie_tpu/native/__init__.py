"""ctypes binding + lazy build of the native C++ oracle.

Compiled on first use with g++ (-O3 -fopenmp), cached next to the source;
falls back cleanly (``available() -> False``) if no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "oracle.cpp"
_LIB = _DIR / "liboracle.so"
_lib = None
_build_error: str | None = None

# Must match struct Params in oracle.cpp.
PARAMS_LAYOUT = (
    "h dt rho0 c0 mu xsph_eps st gamma B vcap bk bc "
    "gx gy gz bminx bminy bminz bmaxx bmaxy bmaxz"
).split()


def _build() -> bool:
    global _build_error
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    flag_sets = (
        ["-O3", "-march=native", "-fopenmp"],
        ["-O3", "-fopenmp"],  # -march=native unsupported on some hosts
        ["-O2"],              # no OpenMP available
    )
    for flags in flag_sets:
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
            _build_error = str(e)
    return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(str(_LIB))
    lib.sph_oracle_run.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.sph_oracle_run.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    return _build_error


def pack_params(params) -> np.ndarray:
    """FluidParams -> the packed float64 layout of struct Params."""
    dim = int(params.dim)
    g = list(np.asarray(params.gravity, np.float64)) + [0.0] * (3 - dim)
    bmin = list(np.asarray(params.bound_min, np.float64)) + [0.0] * (3 - dim)
    bmax = list(np.asarray(params.bound_max, np.float64)) + [0.0] * (3 - dim)
    vals = [
        float(params.h),
        float(params.dt),
        float(params.rest_density),
        float(params.sound_speed),
        float(params.viscosity),
        float(params.xsph_eps),
        float(params.surface_tension),
        float(params.eos_gamma),
        float(params.eos_stiffness),
        float(params.max_speed),
        float(params.boundary_stiffness),
        float(params.boundary_damping),
        *g,
        *bmin,
        *bmax,
    ]
    assert len(vals) == len(PARAMS_LAYOUT)
    return np.asarray(vals, np.float64)


def oracle_run(params, pos, vel, mass, steps: int):
    """Run the native oracle; returns (pos, vel) float64 copies."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native oracle unavailable: {_build_error}")
    pos = np.ascontiguousarray(pos, np.float64).copy()
    vel = np.ascontiguousarray(vel, np.float64).copy()
    mass = np.ascontiguousarray(mass, np.float64)
    n, dim = pos.shape
    lib.sph_oracle_run(dim, n, int(steps), pos, vel, mass, pack_params(params))
    return pos, vel
