"""Print the megakernel's measured per-depth roofline/MFU table on the
current backend (run on TPU for the real numbers — VERDICT r2 #3).

    python benchmarks/tpu_mfu.py [--scene cornell|matpreview] [--spp 64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "matpreview"])
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=6)
    args = ap.parse_args()
    import mitsuba2_tpu as mi
    mi.set_variant("scalar_rgb")
    from mitsuba2_tpu.python.test.scenes import (cornell_box_dict,
                                                 matpreview_dict)
    mk_dict = (cornell_box_dict if args.scene == "cornell"
               else matpreview_dict)
    scene = mi.load_dict(mk_dict(width=args.width, height=args.width,
                                 spp=args.spp, max_depth=args.max_depth))
    from mitsuba2_tpu.core.profiler import megakernel_mfu_report
    report, _rows = megakernel_mfu_report(
        scene, spp=args.spp, max_depth=args.max_depth)
    print(report)


if __name__ == "__main__":
    main()
