#!/usr/bin/env python
"""Plugin documentation generator (parity: docs/generate_plugin_doc.py —
the reference extracts reST from plugin source comments; here the plugin
docstrings are the source of truth)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(out_path="docs/plugins.md"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import mitsuba2_tpu  # noqa: F401
    from mitsuba2_tpu.core.object import _REGISTRY, _ensure_loaded
    _ensure_loaded()

    by_cat: dict[str, list] = {}
    for (cat, name), cls in sorted(_REGISTRY.items()):
        by_cat.setdefault(cat, []).append((name, cls))

    lines = ["# Plugin reference", "",
             "Generated from plugin docstrings "
             "(`python docs/generate_plugin_docs.py`).", ""]
    for cat in sorted(by_cat):
        lines.append(f"## {cat}s")
        lines.append("")
        for name, cls in by_cat[cat]:
            doc = (cls.__doc__ or "").strip()
            lines.append(f"### `{name}`")
            lines.append("")
            if doc:
                lines.append(doc)
            lines.append("")
    text = "\n".join(lines)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(text)
    print(f"wrote {out_path}: {len(by_cat)} categories, "
          f"{sum(len(v) for v in by_cat.values())} plugins")


if __name__ == "__main__":
    main(*sys.argv[1:])
