"""Core layer: math, sampling, spectra, transforms, scene description.

Mirrors the role of the reference's libcore (SURVEY.md §2.1)."""

from . import (math, frame, transform, ray, bbox, rng, warp, quad, spline,
               qmc, distr_1d, distr_2d, spectrum)

from .frame import Frame
from .ray import Ray, RayDifferential
from .bbox import BoundingBox
from .transform import Transform, AnimatedTransform
