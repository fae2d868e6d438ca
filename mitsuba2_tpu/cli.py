"""Command-line renderer (parity: src/mitsuba/mitsuba.cpp:33-294).

Usage:
    python -m mitsuba2_tpu [options] <scene.xml|scene.json>

Flags mirror the reference: -m variant, -o output, -D key=value parameter
substitution, -s spp override, -v verbose, -t threads (accepted, advisory —
parallelism is device-mesh based here), -a search paths. SIGHUP/partial-image
handling is replaced by per-pass accumulation writes (-w interval).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(
        prog="mitsuba2_tpu",
        description="TPU-native Mitsuba-class renderer")
    p.add_argument("scene", help="scene file (.xml or .json dict)")
    p.add_argument("-m", "--mode", default="scalar_rgb",
                   help="variant, e.g. scalar_rgb / scalar_spectral")
    p.add_argument("-o", "--output", default=None,
                   help="output image (exr/png/pfm); default: scene name")
    p.add_argument("-D", "--define", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="scene parameter substitution ($key in XML)")
    p.add_argument("-s", "--spp", type=int, default=None,
                   help="override samples per pixel")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sensor", type=int, default=0, help="sensor index")
    p.add_argument("-t", "--threads", type=int, default=None,
                   help="accepted for compatibility (host threading is "
                        "managed by XLA)")
    p.add_argument("-a", "--append-path", action="append", default=[],
                   help="add a file resolver search path")
    p.add_argument("-v", "--verbose", action="count", default=0)
    p.add_argument("--multichip", action="store_true",
                   help="shard samples over all available devices")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--timeout", type=float, default=-1.0,
                   help="stop rendering after this many seconds and "
                   "develop the passes finished so far")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.core.logger import Log, Info, Debug, set_log_level
    from mitsuba2_tpu.core.fresolver import file_resolver
    from mitsuba2_tpu.utils.io_image import write_image
    import numpy as np

    if args.verbose:
        set_log_level(Debug)
    for path in args.append_path:
        file_resolver().append(path)

    mi.set_variant(args.mode)
    params = {}
    for d in args.define:
        k, _, v = d.partition("=")
        params[k] = v

    Log(Info, "Loading scene %s (variant %s)", args.scene, args.mode)
    t0 = time.time()
    if args.scene.endswith(".json"):
        with open(args.scene) as f:
            scene = mi.load_dict(json.load(f))
    else:
        scene = mi.load_file(args.scene, params=params)
    Log(Info, "Scene loaded in %.2fs: %d shapes, %d emitters, %d faces",
        time.time() - t0, len(scene.shapes), len(scene.emitters),
        int(scene.geom.v0.shape[0]))

    if scene.integrator is None:
        from mitsuba2_tpu.core.dictio import load_dict as ld
        scene.integrator = ld({"type": "path"})
    sensor = scene.sensors[args.sensor]
    spp = args.spp or sensor.sampler.sample_count

    integrator = scene.integrator
    if args.timeout > 0:
        integrator.timeout = args.timeout

    out = args.output
    if out is None:
        out = os.path.splitext(args.scene)[0] + ".exr"

    # SIGHUP develops a partial image mid-render; a second SIGINT (after
    # the cooperative cancel) falls through to the default handler
    # (mitsuba.cpp:95-121 semantics)
    import signal

    def _on_hup(signum, frame):
        partial = integrator.develop_partial()
        if partial is not None:
            write_image(out, np.asarray(partial))
            Log(Info, "Wrote partial image %s (SIGHUP)", out)

    def _on_int(signum, frame):
        if integrator._cancel:
            raise KeyboardInterrupt
        Log(Info, "Cancelling render (finishing the current pass) ...")
        integrator.cancel()

    if hasattr(signal, "SIGHUP"):
        try:
            signal.signal(signal.SIGHUP, _on_hup)
        except ValueError:
            pass      # non-main thread (e.g. under a test runner)
    try:
        signal.signal(signal.SIGINT, _on_int)
    except ValueError:
        pass

    Log(Info, "Rendering %dx%d @ %d spp with %s ...",
        sensor.film.crop_size[0], sensor.film.crop_size[1], spp,
        type(scene.integrator).__name__)
    t0 = time.time()
    if args.multichip:
        from mitsuba2_tpu.parallel.mesh import render_multichip
        img = render_multichip(scene, sensor=args.sensor, seed=args.seed,
                               spp=spp)
    else:
        img = scene.integrator.render(scene, sensor=args.sensor,
                                      seed=args.seed, spp=spp)
    img = np.asarray(img)
    dt = time.time() - t0
    n_paths = sensor.film.crop_size[0] * sensor.film.crop_size[1] * spp
    Log(Info, "Rendered in %.2fs (%.2f Mpaths/s)", dt, n_paths / dt / 1e6)

    write_image(out, img)
    Log(Info, "Wrote %s", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
