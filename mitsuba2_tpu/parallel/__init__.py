"""Multi-chip scale-out (no reference counterpart — the reference is a
single-node renderer, SURVEY.md §2.4 'Distributed: ABSENT')."""
