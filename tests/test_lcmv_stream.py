"""Fused streaming LCMV kernel vs direct NumPy math (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from beamform_tpu.kernels.lcmv_stream import lcmv_stream_pallas


def _reference(x_ext, c_uniq, idx, act, w_hist):
    wt, m, nib = x_ext.shape
    t = wt - w_hist
    s_cap = c_uniq.shape[1]
    y = np.zeros((t, nib), dtype=np.complex128)
    white = np.ones((m, m)) + 0.001 * np.eye(m)
    for f in range(t):
        if not act[f]:
            continue
        for b in range(nib):
            hist = x_ext[f:f + w_hist, :, b]
            r = np.einsum("wm,wk->mk", hist, hist.conj()) * white
            c = c_uniq[idx[f], :, :, b].T                  # (M, S)
            xs = np.linalg.solve(r, c)                     # (M, S)
            g = c.conj().T @ xs                            # (S, S)
            for a in range(s_cap):
                if np.all(c[:, a] == 0):
                    g[a, a] += 1.0
            v = np.linalg.solve(g, np.eye(s_cap)[:, 0])
            w = xs @ v
            y[f, b] = w.conj() @ x_ext[f + w_hist, :, b]
    return y


def test_lcmv_stream_matches_direct():
    t, m, w_hist, nib, u, s_cap = 11, 4, 5, 5, 2, 3
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((w_hist + t, m, nib))
         + 1j * rng.standard_normal((w_hist + t, m, nib))).astype(np.complex64)
    c = (rng.standard_normal((u, s_cap, m, nib))
         + 1j * rng.standard_normal((u, s_cap, m, nib))).astype(np.complex64)
    c[:, 2] = 0.0                                  # one inactive slot
    idx = rng.integers(0, u, size=t).astype(np.int32)
    act = rng.integers(0, 2, size=t).astype(np.int32)
    act[:2] = 1

    y = np.asarray(jax.jit(
        lambda *a: lcmv_stream_pallas(*a, w_hist=w_hist, interpret=True)
    )(jnp.asarray(x), jnp.asarray(c), None, jnp.asarray(idx),
      jnp.asarray(act)))

    ref = _reference(x.astype(np.complex128), c.astype(np.complex128),
                     idx, act, w_hist)
    assert np.all(np.isfinite(y))
    scale = np.abs(ref).max()
    assert np.abs(y - ref).max() / scale < 1e-3, (
        np.abs(y - ref).max() / scale)
    assert np.all(y[act == 0] == 0)


def test_lcmv_stream_single_constraint_matches_mvdr_form():
    """With S=1 the LCMV solve reduces to MVDR's w = R^-1 d / (d^H R^-1 d)."""
    t, m, w_hist, nib = 9, 4, 5, 4
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((w_hist + t, m, nib))
         + 1j * rng.standard_normal((w_hist + t, m, nib))).astype(np.complex64)
    c = (rng.standard_normal((1, 1, m, nib))
         + 1j * rng.standard_normal((1, 1, m, nib))).astype(np.complex64)
    idx = np.zeros(t, np.int32)
    act = np.ones(t, np.int32)
    y = np.asarray(jax.jit(
        lambda *a: lcmv_stream_pallas(*a, w_hist=w_hist, interpret=True)
    )(jnp.asarray(x), jnp.asarray(c), None, jnp.asarray(idx),
      jnp.asarray(act)))
    ref = _reference(x.astype(np.complex128), c.astype(np.complex128),
                     idx, act, w_hist)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-3
