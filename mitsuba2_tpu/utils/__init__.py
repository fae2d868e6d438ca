"""Host-side IO and tooling (role of the reference's Bitmap / Struct /
mesh-loader layer, SURVEY.md §2.1)."""
