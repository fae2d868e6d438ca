"""XML loader tests (parity: src/libcore/tests/test_xml.py + test_dict.py)."""

import numpy as np
import pytest

import jax.numpy as jnp


CORNELL_XML = """
<scene version="2.0.0">
    <default name="spp" value="4"/>
    <integrator type="path">
        <integer name="max_depth" value="$depth"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="39.3077"/>
        <transform name="to_world">
            <lookat origin="0, 0, 3.9" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="8"/>
            <integer name="height" value="8"/>
            <rfilter type="box"/>
        </film>
        <sampler type="independent">
            <integer name="sample_count" value="$spp"/>
        </sampler>
    </sensor>
    <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.725 0.71 0.68"/>
    </bsdf>
    <shape type="rectangle">
        <transform name="to_world">
            <rotate value="1 0 0" angle="-90"/>
            <translate value="0 -1 0"/>
        </transform>
        <ref id="white"/>
    </shape>
    <shape type="rectangle">
        <transform name="to_world">
            <rotate value="1 0 0" angle="90"/>
            <scale value="0.23"/>
            <translate value="0 0.99 0"/>
        </transform>
        <ref id="white"/>
        <emitter type="area">
            <rgb name="radiance" value="18.387 13.9873 6.75357"/>
        </emitter>
    </shape>
</scene>
"""


def test_load_string_scene(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    scene = mi.load_string(CORNELL_XML, params={"depth": 3})
    assert len(scene.shapes) == 2
    assert len(scene.emitters) == 1
    assert scene.integrator.max_depth == 3
    assert scene.sensors[0].sampler.sample_count == 4
    img = np.asarray(scene.integrator.render(scene, seed=0))
    assert np.isfinite(img).all()
    assert img.mean() > 0


def test_load_string_bsdf(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    b = mi.load_string("""
        <bsdf version="2.0.0" type="roughconductor">
            <string name="material" value="Au"/>
            <float name="alpha" value="0.2"/>
            <string name="distribution" value="ggx"/>
        </bsdf>""")
    assert type(b).__name__ == "RoughConductor"
    assert np.isclose(b.alpha_u, 0.2)


def test_missing_param_raises(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.xml_impl import XMLParseError
    with pytest.raises(XMLParseError, match="undefined parameter"):
        mi.load_string("""
            <scene version="2.0.0">
                <integrator type="path">
                    <integer name="max_depth" value="$missing"/>
                </integrator>
            </scene>""")


def test_unused_property_raises(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    with pytest.raises(RuntimeError, match="Unreferenced"):
        mi.load_string("""
            <bsdf version="2.0.0" type="diffuse">
                <float name="bogus" value="1"/>
            </bsdf>""")


def test_version_upgrade_camelcase(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    # version < 2: camelCase property names are converted
    s = mi.load_string("""
        <sensor version="0.6.0" type="perspective">
            <float name="nearClip" value="0.5"/>
        </sensor>""")
    assert np.isclose(s.near_clip, 0.5)


def test_transform_composition(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    shape = mi.load_string("""
        <shape version="2.0.0" type="rectangle">
            <transform name="to_world">
                <scale value="2"/>
                <translate value="1 0 0"/>
            </transform>
        </shape>""")
    # scale applied first, then translate: x spans [-1, 3]
    lo, hi = shape.bbox()
    assert np.isclose(lo[0], -1.0) and np.isclose(hi[0], 3.0)


def test_spectrum_plugin_in_xml(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    e = mi.load_string("""
        <emitter version="2.0.0" type="area">
            <spectrum name="radiance" type="d65">
                <float name="scale" value="2.0"/>
            </spectrum>
        </emitter>""")
    assert type(e.radiance).__name__ == "D65Spectrum"


def test_spectrum_curve_value(variant_scalar_rgb):
    import mitsuba2_tpu as mi
    t = mi.load_string("""
        <bsdf version="2.0.0" type="diffuse">
            <spectrum name="reflectance" value="400:0.1, 500:0.5, 700:0.2"/>
        </bsdf>""")
    assert type(t.reflectance).__name__ == "IrregularSpectrum"
