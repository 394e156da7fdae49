"""Fused streaming MVDR kernel vs direct NumPy math (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beamform_tpu.kernels.mvdr_stream import mvdr_stream_pallas


def _reference(x_ext, d_uniq, w_idx, act, w_hist):
    """Direct float64 evaluation of the per-frame MVDR solve."""
    wt, m, nib = x_ext.shape
    t = wt - w_hist
    y = np.zeros((t, nib), dtype=np.complex128)
    white = np.ones((m, m)) + 0.001 * np.eye(m)
    for f in range(t):
        if not act[f]:
            continue
        d = d_uniq[w_idx[f]]
        for b in range(nib):
            hist = x_ext[f:f + w_hist, :, b]          # (W, M)
            s = np.einsum("wm,wk->mk", hist, hist.conj())
            r = s * white
            u = np.linalg.solve(r, d[:, b])
            den = d[:, b].conj() @ u
            w = u / den
            y[f, b] = w.conj() @ x_ext[f + w_hist, :, b]
    return y


def _mk(seed, t=13, m=4, w_hist=5, nib=5, u=2):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((w_hist + t, m, nib))
         + 1j * rng.standard_normal((w_hist + t, m, nib))).astype(np.complex64)
    d = (rng.standard_normal((u, m, nib))
         + 1j * rng.standard_normal((u, m, nib))).astype(np.complex64)
    w_idx = rng.integers(0, u, size=t).astype(np.int32)
    return x, d, w_idx


@pytest.mark.parametrize("act_pattern", ["all", "some"])
def test_stream_kernel_matches_direct(act_pattern):
    t, m, w_hist, nib = 13, 4, 5, 5
    x, d, w_idx = _mk(0, t=t, m=m, w_hist=w_hist, nib=nib)
    rng = np.random.default_rng(1)
    act = (np.ones(t, np.int32) if act_pattern == "all"
           else rng.integers(0, 2, size=t).astype(np.int32))

    y = np.asarray(jax.jit(
        lambda *a: mvdr_stream_pallas(*a, w_hist=w_hist, interpret=True)
    )(jnp.asarray(x), jnp.asarray(d), jnp.asarray(w_idx),
      jnp.asarray(act)))

    ref = _reference(x.astype(np.complex128), d.astype(np.complex128),
                     w_idx, act, w_hist)
    assert y.shape == (t, nib)
    assert np.all(np.isfinite(y))
    scale = np.abs(ref).max()
    assert np.abs(y - ref).max() / scale < 1e-3, (
        np.abs(y - ref).max() / scale)
    # silent frames exactly zero
    assert np.all(y[act == 0] == 0)


def test_stream_kernel_epoch_reset_long():
    # t spanning many epochs, 16 mics (the production shape class)
    t, m, w_hist, nib = 40, 8, 9, 7
    x, d, w_idx = _mk(2, t=t, m=m, w_hist=w_hist, nib=nib, u=3)
    act = np.ones(t, np.int32)
    y = np.asarray(jax.jit(
        lambda *a: mvdr_stream_pallas(*a, w_hist=w_hist, interpret=True)
    )(jnp.asarray(x), jnp.asarray(d), jnp.asarray(w_idx),
      jnp.asarray(act)))
    ref = _reference(x.astype(np.complex128), d.astype(np.complex128),
                     w_idx, act, w_hist)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-3
