"""Matmul (MXU) FFT: two-stage Cooley-Tukey as batched 128-wide matmuls.

XLA's TPU FFT lowering is far from the roofline (~10-16 ms for 45k x 2048
rFFTs on v5e, ~25x slower than the equivalent matmul FLOPs). The MXU eats
128x128 matmuls, so we factor N = N1 * N2 (N1 = 128) and run the classic
decimation:

  forward, x real (F, N):
    x3[f, n1, n2] = x[f, N2*n1 + n2]                    (reshape)
    F1[f, n2, k1] = sum_n1 x3 * W_N1[n1, k1]            (real matmul x2)
    G [f, n2, k1] = F1 * exp(-2i pi n2 k1 / N)          (VPU twiddle)
    X [f, N1*k2 + k1] = sum_n2 G * W_N2[n2, k2]         (matmul over N2)
  and only k2 <= ceil((N/2+1)/N1) is computed for the rFFT half-spectrum.

  inverse (irfft): the same factorisation of the inverse DFT; the final
  stage contracts over k1 with W_N1^+ and only the real part is formed
  (two real matmuls instead of four).

All matmuls run with precision=HIGHEST (f32-accurate on the MXU); max
deviation vs jnp.fft is ~1e-6 relative at N=2048.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

P = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=16)
def _fwd_consts(n: int, n1: int, dtype_str: str):
    n2 = n // n1
    nb_r = n // 2 + 1
    k2max = -(-nb_r // n1)  # ceil: number of k2 slices covering the half
    dt = np.float64 if dtype_str == "float64" else np.float32

    k1 = np.arange(n1)
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), k1) / n1)   # (n1, n1)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n2), k1) / n)    # (n2, n1)
    w2 = np.exp(-2j * np.pi
                * np.outer(np.arange(n2), np.arange(k2max)) / n2)  # (n2, K2)
    return (w1.real.astype(dt), w1.imag.astype(dt),
            tw.real.astype(dt), tw.imag.astype(dt),
            w2.real.astype(dt), w2.imag.astype(dt), n2, k2max, nb_r)


def rfft_mxu(x, n1: int = 128):
    """Real-input FFT -> first n//2+1 bins. x: (..., N) real, N % n1 == 0
    and (N // n1) even. Matches jnp.fft.rfft to f32 round-off."""
    n = x.shape[-1]
    dt = "float64" if x.dtype == jnp.float64 else "float32"
    c1r, c1i, twr, twi, w2r, w2i, n2, k2max, nb_r = _fwd_consts(n, n1, dt)
    lead = x.shape[:-1]
    x3 = x.reshape((-1, n1, n2))

    dn = (((1,), (0,)), ((), ()))  # contract x3 axis1 with w axis0
    f1r = jax.lax.dot_general(x3, jnp.asarray(c1r), dn, precision=P)
    f1i = jax.lax.dot_general(x3, jnp.asarray(c1i), dn, precision=P)
    # f1: (F, n2, n1) indexed [f, n2, k1]
    gr = f1r * twr - f1i * twi
    gi = f1r * twi + f1i * twr
    # stage 2: contract n2 (axis 1) with w2 (n2, K2) -> (F, n1, K2)
    dn2 = (((1,), (0,)), ((), ()))
    xr = (jax.lax.dot_general(gr, jnp.asarray(w2r), dn2, precision=P)
          - jax.lax.dot_general(gi, jnp.asarray(w2i), dn2, precision=P))
    xi = (jax.lax.dot_general(gr, jnp.asarray(w2i), dn2, precision=P)
          + jax.lax.dot_general(gi, jnp.asarray(w2r), dn2, precision=P))
    # (F, k1, k2) -> (F, k2, k1) -> flatten k = N1*k2 + k1
    xr = jnp.swapaxes(xr, -1, -2).reshape((-1, k2max * n1))[:, :nb_r]
    xi = jnp.swapaxes(xi, -1, -2).reshape((-1, k2max * n1))[:, :nb_r]
    out = jax.lax.complex(xr, xi)
    return out.reshape(lead + (nb_r,))


@lru_cache(maxsize=16)
def _inv_consts(n: int, n1: int, dtype_str: str):
    n2 = n // n1
    dt = np.float64 if dtype_str == "float64" else np.float32
    k1 = np.arange(n1)
    wa = np.exp(2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(2j * np.pi * np.outer(np.arange(n2), k1) / n)
    wb = np.exp(2j * np.pi * np.outer(k1, np.arange(n1)) / n1) / n
    return (wa.real.astype(dt), wa.imag.astype(dt),
            tw.real.astype(dt), tw.imag.astype(dt),
            wb.real.astype(dt), wb.imag.astype(dt), n2)


def irfft_mxu(y, n: int, n1: int = 128):
    """Inverse of :func:`rfft_mxu`: (..., n//2+1) Hermitian bins -> (..., n)
    real. Matches jnp.fft.irfft to f32 round-off."""
    dt = "float64" if y.dtype == jnp.complex128 else "float32"
    war, wai, twr, twi, wbr, wbi, n2 = _inv_consts(n, n1, dt)
    lead = y.shape[:-1]
    h = n // 2
    yr0 = y.real.reshape((-1, h + 1))
    yi0 = y.imag.reshape((-1, h + 1))
    # full Hermitian spectrum (F, N): bins h+1..N-1 = conj of h-1..1
    yr = jnp.concatenate([yr0, yr0[:, h - 1:0:-1]], axis=-1)
    yi = jnp.concatenate([yi0, -yi0[:, h - 1:0:-1]], axis=-1)
    # Y[N1*k2 + k1] -> (F, k2=n2, k1=n1)
    yr = yr.reshape((-1, n2, n1))
    yi = yi.reshape((-1, n2, n1))
    # stage A: Z[f, n2', k1] = sum_k2 Y[f, k2, k1] WA[k2, n2']
    zr = (jnp.einsum("fab,ac->fcb", yr, jnp.asarray(war), precision=P)
          - jnp.einsum("fab,ac->fcb", yi, jnp.asarray(wai), precision=P))
    zi = (jnp.einsum("fab,ac->fcb", yr, jnp.asarray(wai), precision=P)
          + jnp.einsum("fab,ac->fcb", yi, jnp.asarray(war), precision=P))
    # z: (F, n2', k1); twiddle exp(+2i pi n2' k1 / N)
    gr = zr * twr - zi * twi
    gi = zr * twi + zi * twr
    # stage B: x[f, N2*n1' + n2'] = Re sum_k1 G[f, n2', k1] WB[k1, n1']
    xr = (jnp.einsum("fbk,kn->fnb", gr, jnp.asarray(wbr), precision=P)
          - jnp.einsum("fbk,kn->fnb", gi, jnp.asarray(wbi), precision=P))
    # (F, n1', n2') -> flatten n = N2*n1' + n2'
    out = xr.reshape((-1, n))
    return out.reshape(lead + (n,))
