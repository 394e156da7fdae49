"""End-to-end demo: synthesize a two-source scene, run every beamformer,
report separation metrics, and write WAVs.

    python examples/demo.py [--outdir /tmp/beamform_demo] [--cpu]

Mirrors the reference's experimental workflow (README.md:33-43 of
balkce/beamform): steer at the target, declare the interferer to LCMV/GSS,
compare everything against the sample-aligned reference path.
"""

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/beamform_demo")
    ap.add_argument("--cpu", action="store_true",
                    help="pin computation to CPU")
    ap.add_argument("--seconds", type=float, default=2.0)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from beamform_tpu.config import EngineConfig
    from beamform_tpu.evaluation import (align_to_ref, evaluate_separation,
                                         synth_scene)
    from beamform_tpu.geometry import ArrayGeometry
    from beamform_tpu.models import get_model
    from beamform_tpu.config import parse_array_config
    from beamform_tpu.runtime import wav as wav_io

    fs, hop = 48000, 512
    xy = [(0.0, 0.0), (0.0, -0.5), (-0.45, -0.25), (0.3, 0.4)]
    cfg = parse_array_config(
        {f"mic{i}": {"id": i, "x": x, "y": y} for i, (x, y) in enumerate(xy)}
        | {"angle_interf1": 90.0})
    engine = EngineConfig(sample_rate=fs, window_size=hop, dtype="float32")
    geom = ArrayGeometry.from_config(cfg)

    rng = np.random.default_rng(0)
    s = int(fs * args.seconds) // hop * hop
    k = np.hanning(16)
    k /= k.sum()

    def src(seed):
        sig = np.convolve(rng.standard_normal(s) * 0.25, k, "same")
        sig[:12 * hop] *= 1e-4   # quiet lead-in for the covariance models
        return sig

    scene = synth_scene(geom, [src(1), src(2)], [0.0, 90.0], fs,
                        noise_std=0.001)
    os.makedirs(args.outdir, exist_ok=True)
    wav_io.write_wav(f"{args.outdir}/mixture.wav", scene.mixture, fs,
                     fmt="float32")

    params = {
        "das": {}, "phase": dict(min_phase=40.0, mag_threshold=0.0),
        "mvdr": dict(freq_mag_threshold=1e-4, freq_max=16000, freq_min=100,
                     out_amp=1.0),
        "lcmv": dict(freq_mag_threshold=1e-4, freq_max=16000, freq_min=100,
                     out_amp=1.0),
        "gss": dict(freq_mag_threshold=1e-4, freq_max=16000, freq_min=100,
                    out_amp=1.0, mu=0.001),
        "gsc": dict(mu0=0.0001, mu_max=0.1, filter_size=128),
        "phasempf": dict(min_phase=30.0, min_mag=0.05, smooth_size=3,
                         MCRA_L=50, out_amp=1.0),
        "mcra": dict(L=50, out_amp=1.0),
    }
    table = {}
    for name, p in params.items():
        model = get_model(name, engine, cfg, p)
        rep = evaluate_separation(model, scene, theta=0.0)
        y = align_to_ref(np.asarray(model.process(scene.mixture, 0.0)), hop)
        wav_io.write_wav(f"{args.outdir}/{name}.wav",
                         np.nan_to_num(y), fs, fmt="float32")
        table[name] = rep
        print(f"{name:9s} SIR {rep['sir_in_db']:6.2f} -> "
              f"{rep['sir_out_db']:6.2f} dB  (gain {rep['sir_gain_db']:+.2f})")
    with open(f"{args.outdir}/report.json", "w") as f:
        json.dump(table, f, indent=2)
    print(f"\nWAVs + report.json in {args.outdir}")


if __name__ == "__main__":
    main()
