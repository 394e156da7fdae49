"""Benchmark harness.

Headline metric (BASELINE.md): xRT — audio-seconds processed per wall-second
per chip — on 16-channel 48 kHz audio, flagship DAS pipeline (STFT -> steered
weighted sum -> iSTFT), vs the 1000x real-time north-star target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Run with --all for the full per-model table on stderr.
"""

import argparse
import json
import sys
import time

import numpy as np

TARGET_XRT = 1000.0


def make_input(num_mics: int, seconds: float, fs: int, dtype=np.float32):
    rng = np.random.default_rng(0)
    x = 0.1 * rng.standard_normal((num_mics, int(seconds * fs)))
    # quiet lead-in keeps MVDR/LCMV cold-start covariances gated off
    x[:, :12 * 1024] *= 1e-4
    return x.astype(dtype)


def aira16_xy():
    import beamform_tpu
    from beamform_tpu.config import load_array_config
    cfg = load_array_config(beamform_tpu.__path__[0] + "/configs/aira16.yaml")
    return cfg


def bench_model(name: str, x, cfg, seconds: float, params=None, theta=20.0,
                repeats: int = 8):
    """Throughput (xRT): K back-to-back dispatches with device-side
    accumulation and ONE scalar fetch at the end. On a tunneled TPU,
    per-call block_until_ready can return before execution finishes and a
    sync fetch costs a fixed ~27 ms round-trip; amortizing over K calls with
    a single forcing fetch measures true device throughput."""
    import jax
    import jax.numpy as jnp
    from beamform_tpu.config import EngineConfig
    from beamform_tpu.models import get_model

    engine = EngineConfig(sample_rate=48000, window_size=1024,
                          dtype="float32")
    model = get_model(name, engine, cfg, params)
    xd = jax.device_put(x)

    def run_k(k):
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(k):
            y = model.process(xd, theta)
            acc = acc + y[-5:].sum()
        float(acc)  # single forcing round-trip
        return time.perf_counter() - t0

    run_k(2)  # warmup / compile
    dt = min(run_k(repeats), run_k(repeats))  # best of two sets
    return repeats * seconds / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--mics", type=int, default=16)
    ap.add_argument("--all", action="store_true",
                    help="benchmark every model (table on stderr)")
    ap.add_argument("--batch", type=int, default=0,
                    help="also measure aggregate multi-stream throughput "
                         "for this batch size (table on stderr)")
    args = ap.parse_args()

    cfg = aira16_xy() if args.mics == 16 else None
    if cfg is None or cfg.num_mics != args.mics:
        from beamform_tpu.config import parse_array_config
        rng = np.random.default_rng(1)
        doc = {f"mic{i}": {"id": i,
                           "x": float(rng.uniform(-0.2, 0.2)),
                           "y": float(rng.uniform(-0.2, 0.2))}
               for i in range(args.mics)}
        doc["mic0"] = {"id": 0, "x": 0.0, "y": 0.0}
        cfg = parse_array_config(doc)

    x = make_input(args.mics, args.seconds, 48000)

    xrt = bench_model("das", x, cfg, args.seconds)
    result = {
        "metric": f"xrt_das_{args.mics}ch_48kHz",
        "value": round(xrt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / TARGET_XRT, 3),
    }

    if args.batch:
        import jax
        import jax.numpy as jnp
        from beamform_tpu.config import EngineConfig
        from beamform_tpu.runtime.batch import BatchRunner
        engine = EngineConfig(sample_rate=48000, window_size=1024,
                              dtype="float32")
        rng = np.random.default_rng(2)
        bt = {}
        for name, p in [("das", {}),
                        ("gsc", dict(mu0=0.0001, mu_max=0.1,
                                     filter_size=128)),
                        ("gss", dict(freq_mag_threshold=0.001,
                                     freq_max=16000, freq_min=100,
                                     mu=0.001))]:
            try:
                runner = BatchRunner(name, engine, cfg, p, batch=args.batch)
                xs = jax.device_put((0.1 * rng.standard_normal(
                    (args.batch, args.mics,
                     int(args.seconds * 48000) // 1024 * 1024))
                ).astype(np.float32))
                thetas = np.linspace(-60, 60, args.batch)
                acc = runner.process(xs, thetas)[:, -5:].sum()
                float(acc)  # warm
                t0 = time.perf_counter()
                acc = jnp.zeros(())
                for _ in range(4):
                    acc = acc + runner.process(xs, thetas)[:, -5:].sum()
                float(acc)
                dt = time.perf_counter() - t0
                bt[name] = round(4 * args.batch * args.seconds / dt, 1)
            except Exception as e:
                bt[name] = f"ERROR {type(e).__name__}: {e}"[:120]
            print(f"  batch{args.batch} {name}: {bt[name]} aggregate xRT",
                  file=sys.stderr)
        print(json.dumps({"batched_xrt": bt}), file=sys.stderr)

    if args.all:
        table = {"das": round(xrt, 1)}
        launch = {
            "phase": dict(),
            "mvdr": dict(freq_mag_threshold=0.001, freq_max=16000,
                         freq_min=100, out_amp=1.0),
            "lcmv": dict(freq_mag_threshold=0.001, freq_max=16000,
                         freq_min=100, out_amp=1.0),
            "gss": dict(freq_mag_threshold=0.001, freq_max=16000,
                        freq_min=100, out_amp=0.1, mu=0.001),
            "gsc": dict(mu0=0.0001, mu_max=0.1, filter_size=128),
            "mcra": dict(L=300, out_amp=3.5, out_only_noise=False),
            "phasempf": dict(min_phase=30.0, min_mag=0.05, smooth_size=3,
                             MCRA_L=50, out_amp=2.5),
            "ref": dict(),
        }
        for name, p in launch.items():
            try:
                table[name] = round(bench_model(name, x, cfg, args.seconds,
                                                p), 1)
            except Exception as e:  # keep the headline alive
                table[name] = f"ERROR {type(e).__name__}: {e}"[:120]
            print(f"  {name}: {table[name]} xRT", file=sys.stderr)
        print(json.dumps({"all_models_xrt": table}), file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
