#!/usr/bin/env python
"""Read MK_SWEEP_STATS traversal counters for the biggeo config.

Must run with MK_SWEEP_STATS=1 (the render image's channels become
cumulative [node pops, leaf encounters, row sweeps] totals). Prints the
per-bounce-tile averages that bound the HBM BVH tier's throughput:

  time/tile-walk ~= pops * t_node + row_sweeps * t_sweep  (t_sweep ~0.5us)
"""
import os
import sys

os.environ["MK_SWEEP_STATS"] = "1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import bumpy_sphere_dict
    spp = int(os.environ.get("STATS_SPP", "8"))
    depth = int(os.environ.get("STATS_DEPTH", "5"))
    scene = mi.load_dict(bumpy_sphere_dict(width=256, height=256,
                                           spp=spp, max_depth=depth,
                                           nu=512, nv=257))
    integ = scene.integrator
    img = np.asarray(integ.render(scene, seed=1, spp=spp))[..., :3]
    total = img.sum(axis=(0, 1)) * 1.0   # develop divides by spp? check
    # film develop normalizes by weight=spp; undo it
    total = total * spp
    n = 256 * 256 * spp
    from mitsuba2_tpu.ops.megakernel import RAY_TILE
    tile = 1024    # hbm tier tile
    n_tiles = int(np.ceil(n / tile))
    # closest+shadow walks happen per bounce per tile; escape bounces
    # shrink live tiles, so report per (tile x bounce) as an average
    walks = n_tiles * depth
    print(f"engine={integ.last_engine} paths={n} tiles={n_tiles} "
          f"depth={depth}")
    print(f"totals: node_pops={total[0]:.3e} leaf_enc={total[1]:.3e} "
          f"row_sweeps={total[2]:.3e}")
    print(f"per tile-bounce: pops={total[0] / walks:8.1f} "
          f"leaves={total[1] / walks:8.1f} "
          f"row_sweeps={total[2] / walks:8.1f} "
          f"rows/leaf={total[2] / max(total[1], 1):4.2f}")
    print(f"per path: row_sweeps={total[2] / n:6.2f} "
          f"(x0.5us/sweep -> {total[2] / n * 0.5:5.2f} us/path "
          f"= {1.0 / max(total[2] / n * 0.5e-6, 1e-12) / 1e6:6.2f} "
          f"Mpaths/s sweep-bound)")


if __name__ == "__main__":
    main()
