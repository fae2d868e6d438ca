"""mitsuba2_tpu — a TPU-native physically-based rendering framework.

Capability parity target: mitsuba-renderer/mitsuba2 (see SURVEY.md). The
compute path is JAX/XLA/Pallas; variants are runtime configs; scenes compile
to SoA device tables driven by a jitted wavefront integrator.
"""

from .variants import (set_variant, variant, variants, variant_config,
                       Variant)

__version__ = "0.1.0"

__all__ = ["set_variant", "variant", "variants", "variant_config", "Variant",
            "load_file", "load_string", "load_dict"]


def load_dict(d, **kwargs):
    """Instantiate a scene/plugin from a Python dict (parity:
    mitsuba.core.xml.load_dict, src/libcore/python/xml_v.cpp:56)."""
    from .core.dictio import load_dict as _ld
    return _ld(d, **kwargs)


def load_file(path, **kwargs):
    """Load a Mitsuba XML scene file (parity: xml.load_file, xml.h:33)."""
    from .core.xmlio import load_file as _lf
    return _lf(path, **kwargs)


def load_string(s, **kwargs):
    """Load a scene from an XML string (parity: xml.load_string, xml.h:39)."""
    from .core.xmlio import load_string as _ls
    return _ls(s, **kwargs)

# NOTE: no top-level `render` — the name belongs to the render/ subpackage;
# use scene.integrator.render(...) or python.autodiff.render(...).


def traverse(obj):
    """Top-level traverse (util.py traverse): differentiable-parameter
    discovery -> ParameterMap."""
    from .python.util import traverse as _traverse
    return _traverse(obj)


from .core.transform import Transform  # noqa: E402 (mi.Transform.look_at)

__all__ += ["traverse", "Transform"]
