"""XML scene loader — placeholder wired for the tooling milestone.

Target parity: src/libcore/xml.cpp (Tag dispatch, version upgrade, $param
substitution, rgb/spectrum auto-textures, named refs — SURVEY.md §2.1). The
dict loader (dictio.py) provides the same object-construction path; this
module will translate XML trees into those dicts.
"""

from __future__ import annotations


def load_file(path, variant=None, params=None, update=False):
    from .xml_impl import load_file as _impl
    return _impl(path, params=params)


def load_string(s, variant=None, params=None):
    from .xml_impl import load_string as _impl
    return _impl(s, params=params)
