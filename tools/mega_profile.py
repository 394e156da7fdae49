"""Attribute mega-kernel time: analysis/synthesis/covariance vs solve chain.

VERDICT round-4 item 4 asks where the mvdr/lcmv wall time goes before
optimizing further (roofline says ~2.5% MFU — the serial per-frame
Cholesky chain is the suspect). The mega kernel has no per-stage timers
(one fused Pallas program), but the energy gate gives a clean knob: with
``freq_mag_threshold`` above any input magnitude, NO frame passes the gate
and the per-frame solve bodies are skipped entirely (pl.when(act)) while
analysis, gating, the sliding covariance march, and synthesis all still
run (mvdr.cpp:84-101 semantics: history shifts regardless of the gate).

    solve_share = 1 - t(gate_off) / t(normal)

Run on the real chip: ``python tools/mega_profile.py [--seconds 30]``.
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--mics", type=int, default=16)
    ap.add_argument("--models", default="mvdr,lcmv")
    ap.add_argument("--trace", default="",
                    help="directory for a jax.profiler trace of one run")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import bench
    bench.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from beamform_tpu.config import EngineConfig
    from beamform_tpu.models import get_model

    cfg = bench.aira16_xy()
    engine = EngineConfig(sample_rate=48000, window_size=1024,
                          dtype="float32")
    x = bench.make_input(args.mics, args.seconds, 48000)
    xd = jax.device_put(x)
    lat = bench.fetch_latency()

    base = dict(freq_mag_threshold=0.001, freq_max=16000, freq_min=100,
                out_amp=1.0)

    def timed(model, k):
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(k):
            y = model.process(xd, 20.0)
            acc = acc + y[-5:].sum()
        float(acc)
        return time.perf_counter() - t0 - lat

    for name in args.models.split(","):
        rows = {}
        for label, thr in (("normal", base["freq_mag_threshold"]),
                           ("gate_off", 1e9)):
            model = get_model(name, engine, cfg,
                              dict(base, freq_mag_threshold=thr))
            timed(model, 1)                      # compile
            k = max(4, int(1.5 / max(timed(model, 2) / 2, 1e-3)))
            ts = [timed(model, k) / k for _ in range(3)]
            rows[label] = float(np.median(ts))
            print(f"  {name} {label:9s}: {rows[label]*1e3:8.2f} ms "
                  f"({args.seconds / rows[label]:7.1f}x RT, k={k})",
                  file=sys.stderr)
        share = 1.0 - rows["gate_off"] / rows["normal"]
        print(f"{name}: solve chain = {share*100:.1f}% of wall "
              f"(normal {args.seconds/rows['normal']:.0f}x, "
              f"gate_off {args.seconds/rows['gate_off']:.0f}x RT)")

    if args.trace:
        model = get_model("mvdr", engine, cfg, base)
        timed(model, 1)
        with jax.profiler.trace(args.trace):
            timed(model, 4)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
