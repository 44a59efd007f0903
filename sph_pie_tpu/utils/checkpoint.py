"""Checkpoint / resume.

The reference persists continuously (every write re-serialises state to
disk — SURVEY.md §5 "checkpoint by persistence") and restart = reload
files. For a simulation engine the sane equivalent is explicit snapshots:
the full SoA state + params + step counter in one ``.npz`` written
atomically, with a rotating manager that keeps the newest K. No heavyweight
dependency — a checkpoint is a plain archive loadable with NumPy alone.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from sph_pie_tpu.core.params import FluidParams
from sph_pie_tpu.core.state import ParticleState

FORMAT_VERSION = 1


def save_state(
    path: str | Path,
    state: ParticleState,
    params: FluidParams | None = None,
    step: int = 0,
    extra: dict | None = None,
):
    """Atomic snapshot (tmp + rename) of state [+ params/meta]."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {
        f"state.{f.name}": np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    meta = {"version": FORMAT_VERSION, "step": int(step), "extra": extra or {}}
    if params is not None:
        for f in dataclasses.fields(params):
            v = getattr(params, f.name)
            if isinstance(v, (int, float)):
                meta.setdefault("params_static", {})[f.name] = v
            else:
                arrays[f"params.{f.name}"] = np.asarray(v)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    # Dot-prefixed temp name: must NOT match the manager's 'ckpt_*.npz'
    # glob, or a crash between savez and rename leaves a file whose stem
    # breaks the rotation sort forever. Ends in .npz so numpy doesn't
    # append another extension.
    tmp = path.parent / f".{path.stem}.tmp.npz"
    np.savez_compressed(tmp, **arrays)
    tmp.replace(path)
    return path


def load_state(path: str | Path):
    """Returns (state, params_or_None, step, extra)."""
    with np.load(Path(path)) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta["version"] > FORMAT_VERSION:
            raise ValueError(f"checkpoint version {meta['version']} too new")
        sf = {
            k.split(".", 1)[1]: jnp.asarray(z[k])
            for k in z.files
            if k.startswith("state.")
        }
        state = ParticleState(**sf)
        params = None
        pf = {
            k.split(".", 1)[1]: jnp.asarray(z[k])
            for k in z.files
            if k.startswith("params.")
        }
        if pf:
            pf.update(meta.get("params_static", {}))
            params = FluidParams(**pf)
    return state, params, meta["step"], meta.get("extra", {})


class CheckpointManager:
    """Rotating snapshots: ckpt_<step>.npz, newest ``keep`` retained."""

    def __init__(self, directory: str | Path, keep: int = 3):
        self.dir = Path(directory)
        self.keep = keep

    def _all(self) -> list[Path]:
        found = []
        for p in self.dir.glob("ckpt_*.npz"):
            try:
                found.append((int(p.stem.split("_")[1]), p))
            except ValueError:
                continue  # stray non-checkpoint file; never break rotation
        return [p for _, p in sorted(found)]

    def save(self, state, params=None, step: int = 0, extra=None) -> Path:
        path = save_state(self.dir / f"ckpt_{step}.npz", state, params, step, extra)
        for old in self._all()[: -self.keep]:
            old.unlink(missing_ok=True)
        return path

    def latest(self) -> Path | None:
        all_ = self._all()
        return all_[-1] if all_ else None

    def restore_latest(self):
        latest = self.latest()
        if latest is None:
            return None
        return load_state(latest)
