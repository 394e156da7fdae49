"""Gate-aware sparse covariance solves for MVDR/LCMV.

The reference only runs the per-bin covariance solve at bins whose energy
gate passes (``mag > freq_mag_threshold``, mvdr.cpp:84-96); everything else
is a 0.01 passthrough. The round-1 dense path solved every in-band bin at
every frame — faithful output, but it pays the full solve cost even on
sparse (speech-like) spectra where the reference's per-bin loop does almost
nothing.

This module restores the reference's work profile with static shapes:

1. compact the gate-passing (frame, bin) pairs to the front of an index
   array (cumsum scatter — no sort needed);
2. walk the passing pairs in fixed-size chunks with a ``fori_loop`` whose
   trip count is ``ceil(K / chunk)`` for the *actual* pass count K — cost
   scales with audio content, shapes stay compile-time static;
3. per chunk: gather the W-frame FFT histories, build the covariances as
   one small batched einsum, solve (Pallas Gauss-Jordan on TPU), and
   scatter the beamformed bins back over the 0.01-passthrough base.

State (the rolling FFT history) is untouched: the reference shifts history
for every in-band bin regardless of the gate (mvdr.cpp:100-101), and here
the history is simply the last W frames of the input spectra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SOLVE_CHUNK = 512   # == the Pallas Gauss-Jordan lane tile: one kernel tile


def compact_gate(gate):
    """gate (T, Nib) bool -> (order, k_total): ``order`` (padded to a chunk
    multiple) lists the flat indices of passing pairs first, sentinel B
    afterwards; ``k_total`` is the pass count."""
    b = gate.size
    gflat = gate.ravel()
    k_total = jnp.sum(gflat.astype(jnp.int32))
    pos = jnp.cumsum(gflat.astype(jnp.int32)) - 1
    tgt = jnp.where(gflat, pos, b)
    bp = -(-b // SOLVE_CHUNK) * SOLVE_CHUNK
    order = jnp.full((bp,), b, dtype=jnp.int32)
    order = order.at[tgt].set(jnp.arange(b, dtype=jnp.int32), mode="drop")
    return order, k_total


def run_gated(order, k_total, y_base, chunk_body):
    """Scatter ``chunk_body`` results over the passthrough base.

    y_base (T, Nib) complex; chunk_body(f, n, valid) -> y_c (chunk,) for
    candidate frames f / bins n (sentinel-padded tails have valid=False).
    Trip count is data-dependent (``ceil(K/chunk)`` via while-loop); each
    trip costs one fixed-size gather->solve->scatter.
    """
    t, nib = y_base.shape
    bsent = t * nib
    y_flat = y_base.ravel()
    nchunks = (k_total + SOLVE_CHUNK - 1) // SOLVE_CHUNK

    def step(i, y):
        idx = jax.lax.dynamic_slice(order, (i * SOLVE_CHUNK,),
                                    (SOLVE_CHUNK,))
        f = idx // nib
        n = idx - f * nib
        valid = (i * SOLVE_CHUNK
                 + jnp.arange(SOLVE_CHUNK, dtype=jnp.int32)) < k_total
        y_c = chunk_body(f, n, valid)
        tgt = jnp.where(valid, idx, bsent)
        return y.at[tgt].set(y_c, mode="drop")

    y_flat = jax.lax.fori_loop(0, nchunks, step, y_flat)
    return y_flat.reshape(t, nib)


def gather_hist(xe2, f, n, w_hist, nib):
    """FFT histories for candidates: xe2 ((W+T)*Nib, M) complex (frame-major
    per-bin rows); returns (W, chunk, M) — rows t..t+W-1 are the W frames
    BEFORE candidate frame f (the reference solves on pre-update history,
    mvdr.cpp:87,100-101)."""
    rows = (f[None, :] + jnp.arange(w_hist, dtype=jnp.int32)[:, None]) * nib \
        + n[None, :]
    return xe2[rows]


def flatten_bins(x_ext):
    """(W+T, M, Nib) -> ((W+T)*Nib, M): gather-friendly row layout."""
    te, m, nib = x_ext.shape
    return jnp.moveaxis(x_ext, 1, 2).reshape(te * nib, m)
