"""Device kernels: intersection, BVH, compaction (role of the reference's
Embree/OptiX/kdtree layer, SURVEY.md §2.2)."""
