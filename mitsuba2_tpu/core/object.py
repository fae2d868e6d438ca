"""Object model + plugin registry.

Parity: include/mitsuba/core/object.h (Object, traverse(),
parameters_changed(), expand()) and plugin.h/class.h (PluginManager,
Class::for_name/construct). dlopen'ed shared libraries become a Python
registry mapping (category, name) -> class; variant retargeting is not needed
because a single implementation serves every variant at trace time.
"""

from __future__ import annotations

from typing import Callable

from .properties import Properties


class TraversalCallback:
    """Parity with object.h:271 — collects differentiable parameters."""

    def put_parameter(self, name: str, value):
        raise NotImplementedError

    def put_object(self, name: str, obj: "Object"):
        raise NotImplementedError


class Object:
    plugin_name: str = ""

    def __init__(self, props: Properties | None = None):
        self.id = props.id if props is not None else ""

    def expand(self) -> list["Object"]:
        """Split into multiple objects at load time (object.h:62 — e.g. the
        reference's sunsky -> sun + sky)."""
        return [self]

    def traverse(self, cb: TraversalCallback) -> None:
        """Expose differentiable parameters / children (object.h:75)."""

    def parameters_changed(self, keys: list[str] | None = None) -> None:
        """Notification after parameters were updated out-of-band
        (object.h:96)."""

    # -- parameter write-back (backs ParameterMap.update / .bind) ---------------
    def get_parameter(self, name: str):
        attr = self._param_attr(name)
        obj, leaf = self._resolve_attr(attr)
        return getattr(obj, leaf)

    def set_parameter(self, name: str, value) -> None:
        global _PARAM_EPOCH
        _PARAM_EPOCH += 1
        attr = self._param_attr(name)
        obj, leaf = self._resolve_attr(attr)
        setattr(obj, leaf, value)

    # mapping from traverse() parameter names to attribute paths; subclasses
    # extend PARAM_ATTRS when the name differs from the attribute
    PARAM_ATTRS: dict = {}

    def _param_attr(self, name: str) -> str:
        return self.PARAM_ATTRS.get(name, name)

    def _resolve_attr(self, path: str):
        obj = self
        parts = path.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        return obj, parts[-1]

    def class_name(self) -> str:
        return type(self).__name__

    def __repr__(self):
        return f"{self.class_name()}[id={self.id!r}]"


# ----------------------------------------------------------------------------
# Plugin registry (role of PluginManager + Class registry)
# ----------------------------------------------------------------------------

# bumped on every out-of-band parameter write; executable caches that bake
# concrete plugin state (render/integrator.py pass cache) key on it so
# ParameterMap.update() invalidates them instead of serving stale params
_PARAM_EPOCH = 0


def param_epoch() -> int:
    return _PARAM_EPOCH


_REGISTRY: dict[tuple[str, str], type] = {}
_CATEGORY_OF: dict[str, str] = {}


def register_plugin(category: str, name: str):
    """Class decorator: register a plugin under (category, name)."""

    def wrap(cls):
        cls.plugin_name = name
        cls.plugin_category = category
        _REGISTRY[(category, name)] = cls
        return cls

    return wrap


def plugin_class(category: str, name: str) -> type:
    _ensure_loaded()
    try:
        return _REGISTRY[(category, name)]
    except KeyError:
        raise ValueError(
            f"Plugin '{name}' not found in category '{category}'. "
            f"Available: {sorted(n for c, n in _REGISTRY if c == category)}")


def create_object(category: str, props: Properties):
    """Instantiate a plugin (plugin.h create_object). Checks unqueried
    properties afterwards like the XML loader (xml.cpp:1040-1060)."""
    cls = plugin_class(category, props.plugin_name)
    obj = cls(props)
    obj.id = props.id or obj.id
    leftover = props.unqueried()
    if leftover:
        raise RuntimeError(
            f"Unreferenced property {leftover} in plugin "
            f"'{props.plugin_name}' ({category})")
    return obj


def registered_plugins(category: str | None = None):
    _ensure_loaded()
    return sorted(n for (c, n) in _REGISTRY if category is None or c == category)


_loaded = False


def _ensure_loaded():
    """Import the plugin library once (role of dlopen in plugin.cpp)."""
    global _loaded
    if _loaded:
        return
    _loaded = True
    from ..models import ALL_PLUGIN_MODULES  # noqa: F401
