"""The plugin library (capability parity with reference src/<kind>/ —
SURVEY.md §2.3). Importing this package registers every plugin."""

from . import (textures, rfilters, bsdfs, emitters, sensors, films,
               samplers, shapes, integrators, spectra, media, media_impl,
               measured, phase, rb)

ALL_PLUGIN_MODULES = [textures, rfilters, bsdfs, emitters, sensors, films,
                      samplers, shapes, integrators, spectra, media,
                      media_impl, measured, phase, rb]
