"""Gate-aware sparse covariance solves for MVDR/LCMV.

The reference only runs the per-bin covariance solve at bins whose energy
gate passes (``mag > freq_mag_threshold``, mvdr.cpp:84-96); everything else
is a 0.01 passthrough. The round-1 dense path solved every in-band bin at
every frame — faithful output, but it pays the full solve cost even on
sparse (speech-like) audio where the reference's per-bin loop does almost
nothing.

This module skips the covariance work at FRAME granularity with static
shapes:

1. a frame is *active* iff any of its in-band bins passes the gate — on
   silent frames (speech pauses: most of real audio) every bin takes the
   0.01 passthrough and neither R nor the solve is ever needed;
2. active frame indices are compacted to the front of an index array
   (cumsum scatter), then walked in fixed-size chunks by a ``fori_loop``
   whose trip count is ``ceil(K_active / chunk)`` — cost scales with voice
   activity, shapes stay compile-time static;
3. each chunk gathers its frames' (W+1)-frame FFT windows as whole
   contiguous (M, Nib) rows (XLA's TPU gather is per-row latency-bound at
   ~1 us/row, so few BIG rows beat many small ones by orders of
   magnitude), builds the covariances with one einsum, solves, and
   scatters the beamformed frames over the passthrough base.

Frame granularity deliberately trades the reference's per-bin skip for
gather efficiency: within an active frame, gate-failed bins are solved and
then discarded by the same ``jnp.where`` as the dense path. Output and
carried state are bit-equal to the dense path's math on the same frames
(tests/test_gated_sparse.py); the worst case (every frame active) costs
~1.3x dense, the speech case wins by 1/activity.

State is untouched: the reference shifts history for every in-band bin
regardless of the gate (mvdr.cpp:100-101), and here the history is simply
the last W frames of the input spectra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FRAME_CHUNK = 64   # active frames per loop trip (~44k solves at 16ch bench)


def compact_active_frames(gate):
    """gate (T, Nib) bool -> (order, k_active): ``order`` (padded to a
    chunk multiple) lists active frame indices first, sentinel T after."""
    t = gate.shape[0]
    active = jnp.any(gate, axis=1)                     # (T,)
    k = jnp.sum(active.astype(jnp.int32))
    pos = jnp.cumsum(active.astype(jnp.int32)) - 1
    tgt = jnp.where(active, pos, t)
    tp = -(-t // FRAME_CHUNK) * FRAME_CHUNK
    order = jnp.full((tp,), t, dtype=jnp.int32)
    order = order.at[tgt].set(jnp.arange(t, dtype=jnp.int32), mode="drop")
    return order, k


def run_frame_gated(order, k_active, y_base, chunk_body):
    """Scatter ``chunk_body`` frame results over the passthrough base.

    y_base (T, Nib) complex; chunk_body(f) -> (chunk, Nib) beamformed rows
    for frame indices f (sentinel-padded tails produce garbage rows that
    the scatter drops).
    """
    t, nib = y_base.shape
    nchunks = (k_active + FRAME_CHUNK - 1) // FRAME_CHUNK

    def step(i, y):
        f = jax.lax.dynamic_slice(order, (i * FRAME_CHUNK,), (FRAME_CHUNK,))
        y_c = chunk_body(f)
        tgt = jnp.where(f < t, f, t)                    # drop sentinels
        return y.at[tgt].set(y_c, mode="drop")

    return jax.lax.fori_loop(0, nchunks, step, y_base)


def gather_frame_windows(x_ext, f, w_hist: int):
    """x_ext (W+T, M, Nib); f (chunk,) active frame indices. Returns
    (hist (chunk, W, M, Nib), cur (chunk, M, Nib)): the W frames BEFORE
    frame f (the reference solves on pre-update history,
    mvdr.cpp:87,100-101) and frame f itself. One big-row gather: chunk *
    (W+1) rows of M*Nib elements each."""
    rows = f[:, None] + jnp.arange(w_hist + 1, dtype=jnp.int32)[None, :]
    rows = jnp.minimum(rows, x_ext.shape[0] - 1)        # sentinel clamp
    xw = x_ext[rows]                                    # (C, W+1, M, Nib)
    return xw[:, :w_hist], xw[:, w_hist]
