"""Ad-hoc MVDR dense-vs-sparse profiling on the real chip.

Usage: python tools/mvdr_profile.py [--seconds 20] [--input dense|speech]
Times the mvdr model with solver=dense vs solver=sparse on the same input.
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--mics", type=int, default=16)
    ap.add_argument("--input", default="speech", choices=["dense", "speech"])
    ap.add_argument("--solvers", default="dense,sparse")
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--trace", default="")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import make_input, make_speech_input, aira16_xy, LAUNCH
    import jax
    import jax.numpy as jnp
    from beamform_tpu.config import EngineConfig
    from beamform_tpu.models import get_model

    cfg = aira16_xy()
    mk = make_input if args.input == "dense" else make_speech_input
    x = mk(args.mics, args.seconds, 48000)
    engine = EngineConfig(sample_rate=48000, window_size=1024,
                          dtype="float32")
    xd = jax.device_put(x)

    for solver in args.solvers.split(","):
        params = dict(LAUNCH["mvdr"], solver=solver)
        model = get_model("mvdr", engine, cfg, params)

        def run_k(k):
            acc = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(k):
                y = model.process(xd, 20.0)
                acc = acc + y[-5:].sum()
            float(acc)
            return time.perf_counter() - t0

        run_k(2)
        if args.trace:
            with jax.profiler.trace(args.trace + "_" + solver):
                run_k(2)
        dt = min(run_k(args.repeats), run_k(args.repeats))
        xrt = args.repeats * args.seconds / dt
        print(f"{solver:8s} input={args.input}: {xrt:8.1f} xRT "
              f"({dt / args.repeats * 1e3:.1f} ms/call)")


if __name__ == "__main__":
    main()
