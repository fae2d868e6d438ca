"""Scene parameter traversal (parity: src/python/python/util.py —
``traverse(scene) -> ParameterMap``, ``params.keep/update``, object.h:271
TraversalCallback).

Differentiability contract: ``ParameterMap.bind(values)`` temporarily installs
(possibly traced) arrays into the owning plugin objects so a jitted render
closure differentiates w.r.t. them — the JAX replacement for Enoki's
``set_requires_gradient`` tape markers.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp

from ..core.object import Object, TraversalCallback


class SceneTraversal(TraversalCallback):
    def __init__(self, root, name=""):
        self.entries = {}   # key -> (owner, local_name, value)
        self._visited = set()
        self._walk(root, name)

    def _walk(self, obj, prefix):
        if id(obj) in self._visited:
            return
        self._visited.add(id(obj))
        self._stack_prefix = prefix
        self._stack_obj = obj
        # collect this object's parameters + children
        params = []
        children = []

        class _CB(TraversalCallback):
            def put_parameter(s, name, value):
                params.append((name, value))

            def put_object(s, name, child):
                children.append((name, child))

        obj.traverse(_CB())
        for name, value in params:
            key = f"{prefix}.{name}" if prefix else name
            self.entries[key] = (obj, name, value)
        for name, child in children:
            key = f"{prefix}.{name}" if prefix else name
            self._walk(child, key)


class ParameterMap:
    """(util.py:14) dict-like view over differentiable scene parameters."""

    def __init__(self, entries, root=None):
        self._entries = dict(entries)   # key -> (owner, local_name, value)
        self._root = root
        self._dirty = set()

    # -- dict interface ---------------------------------------------------------
    def __len__(self):
        return len(self._entries)

    def __contains__(self, key):
        return key in self._entries

    def __iter__(self):
        return iter(self._entries)

    def keys(self):
        return self._entries.keys()

    def items(self):
        return ((k, v[2]) for k, v in self._entries.items())

    def __getitem__(self, key):
        return self._entries[key][2]

    def __setitem__(self, key, value):
        owner, name, _ = self._entries[key]
        self._entries[key] = (owner, name, value)
        self._dirty.add(key)

    def keep(self, keys):
        """Restrict to the given key(s) (util.py keep)."""
        if isinstance(keys, str):
            keys = [keys]
        self._entries = {k: v for k, v in self._entries.items() if k in keys}
        missing = set(keys) - set(self._entries)
        if missing:
            raise KeyError(f"parameters not found: {sorted(missing)}")
        return self

    def update(self):
        """Write pending values into the plugins + fire parameters_changed
        (util.py:115-127)."""
        touched = set()
        for key in self._dirty:
            owner, name, value = self._entries[key]
            owner.set_parameter(name, value)
            touched.add(id(owner))
        for key, (owner, name, _) in self._entries.items():
            if id(owner) in touched:
                owner.parameters_changed()
        self._dirty.clear()

    # -- autodiff ----------------------------------------------------------------
    def to_dict(self):
        return {k: v[2] for k, v in self._entries.items()}

    @contextlib.contextmanager
    def bind(self, values: dict):
        """Temporarily install (traced) arrays into the plugins."""
        saved = {}
        try:
            for key, val in values.items():
                owner, name, _ = self._entries[key]
                saved[key] = owner.get_parameter(name)
                owner.set_parameter(name, val)
            yield
        finally:
            for key, old in saved.items():
                owner, name, _ = self._entries[key]
                owner.set_parameter(name, old)

    def __repr__(self):
        lines = [f"ParameterMap[{len(self._entries)}]:"]
        for k, (_, _, v) in sorted(self._entries.items()):
            shape = getattr(v, "shape", ())
            lines.append(f"  {k} {shape}")
        return "\n".join(lines)


def traverse(obj: Object) -> ParameterMap:
    """(util.py:140)"""
    t = SceneTraversal(obj)
    return ParameterMap(t.entries, obj)
