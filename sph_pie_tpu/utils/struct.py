"""Pytree dataclass helper.

Small, dependency-free wrapper around ``jax.tree_util.register_dataclass`` so
core state containers are (a) frozen dataclasses and (b) JAX pytrees whose
array fields are traced while ``meta_fields`` stay static (hashable, part of
the jit cache key).
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields listed in ``meta_fields`` are static metadata (must be hashable);
    all other fields are pytree children (arrays / nested pytrees).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        names = [f.name for f in dataclasses.fields(c)]
        data_fields = [n for n in names if n not in meta_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )
        return c

    return wrap if cls is None else wrap(cls)


def replace(obj, **changes):
    """dataclasses.replace that reads naturally at call sites."""
    return dataclasses.replace(obj, **changes)
