"""Hardware deviation sweep: f32 TPU compute path vs f64 reference math.

Validates the BASELINE budget (<= 1e-3 max sample deviation) on the real
chip — the CPU test suite cannot catch TPU-only effects like the MXU's
default bf16 matmul passes (see the HIGHEST pins in models/mvdr.py and
models/lcmv.py). Run from the repo root:

    python tools/tpu_deviation_sweep.py [--mics {3,16}] [--seconds 0.25]

Last run (2026-08-17, v5e, through the fused WOLA + streaming
MVDR/LCMV/GSC kernels): all 8 beamformers within 2.0e-4 at 16 mics
(das 9.7e-8, phase 1.7e-8, mcra 1.8e-7, phasempf 6.0e-7, mvdr 9.8e-6,
lcmv 8.1e-6, gss 2.0e-4, gsc 9.1e-8) and within 7.2e-5 at 3 mics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import yaml  # noqa: E402

FS, HOP, THETA = 48000, 128, 20.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mics", type=int, default=16, choices=(3, 16))
    ap.add_argument("--seconds", type=float, default=0.25)
    ap.add_argument("--full-fft", action="store_true",
                    help="additionally run each node in the full-FFT audit "
                         "layout (EngineConfig.full_fft: the reference's "
                         "literal N-point complex FFT, das.cpp:127-128) on "
                         "the chip and report ext-rFFT vs full-FFT max "
                         "deviation at f32")
    args = ap.parse_args()

    # phase 1: f64 reference math on CPU (x64 must be OFF before any TPU
    # compile — 64-bit types crash Mosaic)
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    jax.config.update("jax_enable_x64", True)

    from conftest import AIRA3, make_scene
    from beamform_tpu.config import EngineConfig, parse_array_config
    from beamform_tpu.models import get_model
    import beamform_tpu

    if args.mics == 16:
        with open(beamform_tpu.__path__[0] + "/configs/aira16.yaml") as f:
            doc = yaml.safe_load(f)
        xy = [(v["x"], v["y"]) for k, v in sorted(doc.items())
              if k.startswith("mic")]
    else:
        doc = {f"mic{i}": {"id": i, "x": xx, "y": yy}
               for i, (xx, yy) in enumerate(AIRA3)}
        xy = list(AIRA3)
    doc_i = dict(doc)
    doc_i["angle_interf1"] = 70.0
    cfg, cfg_i = parse_array_config(doc), parse_array_config(doc_i)
    x = make_scene(xy, fs=FS, seconds=args.seconds, theta_deg=THETA,
                   quiet_hops=8, hop=HOP)

    pw = 20 if args.mics == 16 else 6
    cases = {
        "das": (cfg, {}),
        "phase": (cfg, {}),
        "mcra": (cfg, dict(L=10, out_only_noise=False)),
        "phasempf": (cfg, dict(min_phase=30.0, min_mag=0.05, smooth_size=3,
                               MCRA_L=10)),
        "mvdr": (cfg, dict(past_windows=pw, freq_mag_threshold=0.0008,
                           freq_max=16000.0, freq_min=100.0, out_amp=1.0)),
        "lcmv": (cfg_i, dict(past_windows=pw, freq_mag_threshold=0.0008,
                             freq_max=16000.0, freq_min=100.0, out_amp=1.0)),
        "gss": (cfg_i, dict(freq_mag_threshold=0.0008, freq_max=16000.0,
                            freq_min=100.0, out_amp=0.1, mu=0.001)),
        "gsc": (cfg, dict(mu0=0.0001, mu_max=0.1, filter_size=16)),
    }
    e64 = EngineConfig(sample_rate=FS, window_size=HOP, dtype="float64")
    e32 = EngineConfig(sample_rate=FS, window_size=HOP, dtype="float32")
    y64 = {n: np.asarray(get_model(n, e64, c, p).process(x, THETA))
           for n, (c, p) in cases.items()}

    # phase 2: f32 on the accelerator
    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_default_device", jax.devices()[0])
    e32f = EngineConfig(sample_rate=FS, window_size=HOP, dtype="float32",
                        full_fft=True)
    worst = 0.0
    worst_ff = 0.0
    for n, (c, p) in cases.items():
        y32 = np.asarray(get_model(n, e32, c, p).process(x, THETA))
        dev = float(np.max(np.abs(y32 - y64[n])))
        worst = max(worst, dev)
        flag = "OK  " if dev < 1e-3 else "FAIL"
        print(f"{flag} {n:9s} {args.mics}-mic TPU f32 vs f64 max dev: "
              f"{dev:.3e}  finite: {bool(np.isfinite(y32).all())}",
              flush=True)
        if args.full_fft:
            # the audit layout on real TPU numerics: how far does the
            # reference's literal complex-FFT layout sit from the shipped
            # extended-rFFT path at f32?
            yff = np.asarray(get_model(n, e32f, c, p).process(x, THETA))
            dff = float(np.max(np.abs(yff - y32)))
            worst_ff = max(worst_ff, dff)
            print(f"     {n:9s} ext-rFFT vs full-FFT (TPU f32) max dev: "
                  f"{dff:.3e}", flush=True)
    print(f"worst: {worst:.3e} (budget 1e-3)")
    if args.full_fft:
        print(f"worst ext-vs-full-FFT: {worst_ff:.3e}")
    return 0 if worst < 1e-3 else 1


if __name__ == "__main__":
    raise SystemExit(main())
