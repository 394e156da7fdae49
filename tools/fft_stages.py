"""Stage timing for the MXU FFT path on the real chip."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from beamform_tpu.kernels.mxu_fft import (  # noqa: E402
    _fwd_consts, rfft_mxu, irfft_mxu)

P = jax.lax.Precision.HIGHEST
F = 937 * 16
N = 2048
rng = np.random.default_rng(0)
x = jax.device_put(rng.standard_normal((F, N)).astype(np.float32))


def timeit(fn, *a, repeats=8):
    out = fn(*a)
    float(jnp.abs(jax.tree.leaves(out)[0].ravel()[-1]).astype(jnp.float32))
    t0 = time.perf_counter()
    accs = []
    for _ in range(repeats):
        out = fn(*a)
        accs.append(jax.tree.leaves(out)[0])
    # one forcing fetch at the very end
    s = sum(jnp.abs(a.ravel()[-1]).astype(jnp.float32) for a in accs)
    float(s)
    return (time.perf_counter() - t0) / repeats


c1r, c1i, twr, twi, w2r, w2i, n2, k2max, nb_r = _fwd_consts(N, 128, "float32")


@jax.jit
def stage1(x):
    x3 = x.reshape((-1, 128, n2))
    dn = (((1,), (0,)), ((), ()))
    f1r = jax.lax.dot_general(x3, jnp.asarray(c1r), dn, precision=P)
    f1i = jax.lax.dot_general(x3, jnp.asarray(c1i), dn, precision=P)
    return f1r, f1i


@jax.jit
def stage1_tw(x):
    f1r, f1i = stage1(x)
    gr = f1r * twr - f1i * twi
    gi = f1r * twi + f1i * twr
    return gr, gi


@jax.jit
def full(x):
    return rfft_mxu(x)


@jax.jit
def roundtrip(x):
    return irfft_mxu(rfft_mxu(x), N)


@jax.jit
def xla_fft(x):
    return jnp.fft.rfft(x, axis=-1)


t1 = timeit(stage1, x)
t2 = timeit(stage1_tw, x)
t3 = timeit(full, x)
t4 = timeit(roundtrip, x)
print(f"stage1 matmuls      : {t1 * 1e3:7.2f} ms")
print(f"+ twiddle           : {t2 * 1e3:7.2f} ms")
print(f"full rfft_mxu       : {t3 * 1e3:7.2f} ms (stage2 ~{(t3 - t2) * 1e3:.2f})")
print(f"rfft+irfft roundtrip: {t4 * 1e3:7.2f} ms")
try:
    t5 = timeit(xla_fft, x, repeats=2)
    print(f"jnp.fft.rfft        : {t5 * 1e3:7.2f} ms")
except Exception as e:
    print(f"jnp.fft.rfft failed: {e}")
