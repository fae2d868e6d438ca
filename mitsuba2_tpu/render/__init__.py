"""Rendering layer: scene, interactions, plugin bases, integrator drive.

Mirrors the role of the reference's librender (SURVEY.md §2.2)."""
