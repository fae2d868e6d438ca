"""Dict scene loader.

Parity: mitsuba.core.xml.load_dict (src/libcore/python/xml_v.cpp:56,100-226;
tests src/libcore/tests/test_dict.py): a nested dict with "type" keys
instantiates plugins; "rgb"/"spectrum" sub-dicts become colors/spectra with
the same emitter-vs-reflectance special casing (create_texture_from_rgb /
_spectrum); "id" + {"type": "ref", "id": ...} named references.
"""

from __future__ import annotations

import numpy as np

from .object import create_object
from .properties import Properties

_CATEGORY_BY_TYPE = {
    # plugin name -> category, mirroring the reference's per-directory tags
    "scene": "scene",
}

_CATEGORIES = ["bsdf", "emitter", "sensor", "shape", "integrator", "sampler",
               "film", "rfilter", "texture", "spectrum", "medium", "phase",
               "volume"]


def _category_of(type_name: str) -> str:
    from .object import _REGISTRY, _ensure_loaded
    _ensure_loaded()
    for c in _CATEGORIES:
        if (c, type_name) in _REGISTRY:
            return c
    if type_name == "scene":
        return "scene"
    raise ValueError(f"unknown plugin type '{type_name}'")


class ColorValue:
    """Marks an rgb/spectrum dict so Properties.texture* can special-case
    emitter vs reflectance wrapping (xml.cpp:774-850)."""

    def __init__(self, kind, payload):
        self.kind = kind        # 'rgb' | 'spectrum-uniform' | 'spectrum-curve'
        self.payload = payload


def load_dict(d: dict, within_emitter: bool = False):
    """Instantiate a plugin/scene from a dict."""
    refs: dict[str, object] = {}
    obj = _instantiate(d, refs)
    return obj


def _instantiate(d: dict, refs: dict):
    if "type" not in d:
        raise ValueError("dict is missing the 'type' key")
    type_name = d["type"]

    if type_name == "scene":
        from ..render.scene import Scene
        props = Properties("scene")
        _fill_props(props, d, refs, skip=("type",))
        scene = Scene(props)
        return scene

    if type_name == "rgb":
        return ColorValue("rgb", np.asarray(d["value"], np.float32))
    if type_name == "spectrum":
        value = d["value"]
        if isinstance(value, (int, float)):
            return ColorValue("spectrum-uniform", float(value))
        # list of (wavelength, value) pairs or "400:0.1, 500:0.2" string
        if isinstance(value, str):
            pairs = [p.split(":") for p in value.split(",")]
            curve = [(float(a), float(b)) for a, b in pairs]
        else:
            curve = [(float(a), float(b)) for a, b in value]
        return ColorValue("spectrum-curve", curve)
    if type_name == "ref":
        rid = d["id"]
        if rid not in refs:
            raise ValueError(f"unresolved reference '{rid}'")
        return refs[rid]

    category = _category_of(type_name)
    props = Properties(type_name)
    props.id = d.get("id", "")
    _fill_props(props, d, refs, skip=("type", "id"))
    obj = create_object(category, props)
    if props.id:
        refs[props.id] = obj
    return obj


def _fill_props(props: Properties, d: dict, refs: dict, skip=()):
    from .transform import Transform, AnimatedTransform
    for k, v in d.items():
        if k in skip:
            continue
        if isinstance(v, dict):
            child = _instantiate(v, refs)
            if isinstance(child, ColorValue):
                props[k] = child
            else:
                props[k] = child
                if getattr(child, "id", ""):
                    refs[child.id] = child
        elif isinstance(v, (Transform, AnimatedTransform)):
            props[k] = v
        elif isinstance(v, (bool, int, float, str, list, tuple, np.ndarray)):
            props[k] = v
        else:
            props[k] = v
