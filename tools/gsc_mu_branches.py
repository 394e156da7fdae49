"""How often do GSC channels disagree on the mu branch (cond_c mixed)?

Measures the statistic that decides whether a block-factorized GSC kernel
can use channel-COMBINED gram corrections (docs/ROADMAP.md item 1):

cond_c[t] = mu0^2*bsq_c[t] < mu_max^2*osq[t]. bsq_c is input-only; osq
needs the outputs -> run the scan once on CPU, recompute both, count
samples where 0 < #cond < C (the mixed sets that break channel-combined
gram corrections in a block-factorized kernel).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from bench import make_speech_input, make_input, aira16_xy, LAUNCH
from beamform_tpu.config import EngineConfig
from beamform_tpu.models import get_model

cfg = aira16_xy()
engine = EngineConfig(sample_rate=48000, window_size=1024, dtype="float32")
K = 128
mu0, mu_max = 0.0001, 0.1

for label, maker in (("speech", make_speech_input), ("white", make_input)):
    x = maker(16, 3.0, 48000)
    x = np.ascontiguousarray(x[:, :x.shape[1] // 1024 * 1024])
    model = get_model("gsc", engine, cfg, dict(LAUNCH["gsc"]))
    # stage 1 (aligned streams), then the adaptive scan for outputs
    carry, gstate = model.stream_init()
    import jax.numpy as jnp
    aligned, _ = model.aligned_streams(jnp.asarray(x), jnp.asarray([20.0]),
                                       jnp.zeros(x.shape[1] // 1024, int),
                                       carry)
    a = np.asarray(aligned)                      # (M, S)
    y = np.asarray(model.process(x, 20.0))       # outputs (S,)
    u = a[1:] - a[:-1]                           # (C, S)

    def sliding_sq(v, k):
        c = np.cumsum(np.concatenate([np.zeros((v.shape[0], 1) if v.ndim > 1
                                                else (1,)), v * v], -1), -1)
        return c[..., k:] - c[..., :-k]

    bsq = sliding_sq(u, K)                       # (C, S-K+1) sum of squares
    osq = sliding_sq(y, K)                       # (S-K+1,)
    n = min(bsq.shape[-1], osq.shape[-1])
    # calculate_power = RMS: power = sqrt(msq); cond in squared domain
    cond = (mu0 * mu0 * bsq[:, :n]) < (mu_max * mu_max * osq[None, :n])
    ncond = cond.sum(0)
    C = cond.shape[0]
    mixed = ((ncond > 0) & (ncond < C)).mean()
    all_p = (ncond == C).mean()
    all_q = (ncond == 0).mean()
    print(f"{label}: mixed {mixed:.4f}  all-p {all_p:.4f} "
          f"all-q {all_q:.4f}  (C={C}, {n} samples)")
