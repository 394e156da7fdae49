"""On-chip micro-benchmark of the fused streaming MVDR kernel."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from beamform_tpu.kernels.mvdr_stream import mvdr_stream_pallas  # noqa: E402

T = 937
M = 16
W = 10
NIB = 678
U = 1
SECONDS = T * 1024 / 48000

rng = np.random.default_rng(0)


@jax.jit
def make_inputs(key):
    k1, k2 = jax.random.split(key)
    xr = jax.random.normal(k1, (W + T, M, NIB))
    xi = jax.random.normal(k2, (W + T, M, NIB))
    x = jax.lax.complex(xr, xi)
    d = jax.lax.complex(jax.random.normal(k1, (U, M, NIB)),
                        jax.random.normal(k2, (U, M, NIB)))
    h = x[:W]
    s0 = jnp.einsum("wmn,wkn->mkn", h, jnp.conj(h))
    return x, s0, d


x, s0, d = make_inputs(jax.random.PRNGKey(0))
w_idx = jnp.zeros((T,), jnp.int32)

import itertools
for (label, rate), refine in itertools.product(
        [("dense", 1.0), ("speech", 0.35), ("floor", 0.0)], [True, False]):
    act = jnp.asarray((rng.random(T) < rate).astype(np.int32))

    @jax.jit
    def run(x, s0, d, w_idx, act, refine=refine):
        y = mvdr_stream_pallas(x, s0, d, w_idx, act, w_hist=W,
                               refine=refine)
        return jnp.abs(y[-1]).sum()

    acc = run(x, s0, d, w_idx, act)
    float(acc)  # compile+force
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    reps = 8
    for _ in range(reps):
        acc = acc + run(x, s0, d, w_idx, act)
    float(acc)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:7s} refine={refine!s:5s}: {dt * 1e3:7.2f} ms  "
          f"({dt / T * 1e6:.1f} us/frame, {SECONDS / dt:.0f}x RT)")
