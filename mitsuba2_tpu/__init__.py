"""mitsuba2_tpu — a TPU-native physically-based rendering framework.

Capability parity target: mitsuba-renderer/mitsuba2 (see SURVEY.md). The
compute path is JAX/XLA/Pallas; variants are runtime configs; scenes compile
to SoA device tables driven by a jitted wavefront integrator.
"""

import jax as _jax

# Geometry cannot survive TPU's default bf16 matmul inputs: measured 1%
# ray-intersection error made bounce rays self-hit their own surface
# (t ~ 7e-4 < spawn epsilon) and rendered whole faces black, and NEE
# self-shadowed 18-45% of the light. Everything in a renderer that flows
# through a dot is geometry or radiometry — default to full f32. Hot
# kernels that can tolerate split-bf16 passes opt back in explicitly
# (ops/megakernel._dot3 passes precision=DEFAULT).
_jax.config.update("jax_default_matmul_precision", "highest")

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
