"""Block-factorized GSC kernel vs the lax.scan formulation.

The exact lookahead-8 factorization (kernels/gsc_block.py, prototyped in
tools/gsc_block_proto.py) reorders the reference recurrence's summations
but is algebraically identical — agreement with the scan is at f32
round-off. Small shapes/chunks keep interpret-mode compile times sane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beamform_tpu.config import GscParams
from beamform_tpu.kernels.gsc_block import gsc_block_pallas_batched
from beamform_tpu.models.gsc import gsc_init_state, gsc_sample_step


def run_scan(aligned_b, params, batch):
    def one(a_stream, gst):
        def step(st, a_t):
            return gsc_sample_step(st, a_t, params)
        return jax.lax.scan(step, gst, jnp.moveaxis(a_stream, 0, 1))
    m = aligned_b.shape[1]
    st0 = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        gsc_init_state(m, params.filter_size, jnp.float32))
    return jax.vmap(one)(aligned_b, st0)


@pytest.mark.parametrize("use_vad", [False, True])
def test_block_matches_scan(use_vad):
    b, m, k = 2, 4, 128
    s = 2 * 128
    params = GscParams(mu0=0.05, mu_max=0.1, filter_size=k,
                       use_vad=use_vad, vad_threshold=0.05)
    rng = np.random.default_rng(0)
    aligned = jnp.asarray(
        (0.3 * rng.standard_normal((b, m, s))).astype(np.float32))

    st_ref, out_ref = run_scan(aligned, params, b)
    z = np.zeros
    out, blk, flt, lo, gram, uold = gsc_block_pallas_batched(
        aligned, z((b, m - 1, k), np.float32), z((b, m - 1, k), np.float32),
        z((b, k), np.float32), z((b, m - 1, 8), np.float32),
        z((b, m - 1, 8), np.float32), params, chunk=128, interpret=True)

    scale = float(jnp.abs(out_ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(flt), np.asarray(st_ref.filt),
                               atol=2e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(st_ref.block),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(st_ref.last_out),
                               atol=3e-5 * scale)
    # returned Grams are the exact window-pair dots at the final sample
    up = np.concatenate([np.zeros((b, m - 1, k + 8)),
                         np.asarray(aligned[:, 1:] - aligned[:, :-1])],
                        axis=-1)
    for l in range(8):
        want = np.sum(up[..., s + 8:s + 8 + k]
                      * up[..., s + 8 - l:s + 8 + k - l], axis=-1)
        np.testing.assert_allclose(np.asarray(gram)[..., l], want,
                                   atol=2e-4, rtol=2e-3)


def test_block_state_continuity():
    """Two kernel calls chain state exactly like one long run (the Gram
    and pre-register-history carries make the factorization seamless
    across call boundaries)."""
    b, m, k = 1, 3, 128
    params = GscParams(mu0=0.01, mu_max=0.05, filter_size=k)
    rng = np.random.default_rng(1)
    a = jnp.asarray(
        (0.2 * rng.standard_normal((b, m, 4 * 128))).astype(np.float32))
    z = np.zeros
    st = (z((b, m - 1, k), np.float32), z((b, m - 1, k), np.float32),
          z((b, k), np.float32), z((b, m - 1, 8), np.float32),
          z((b, m - 1, 8), np.float32))

    full = gsc_block_pallas_batched(a, *st, params, chunk=128,
                                    interpret=True)
    y1, *st1 = gsc_block_pallas_batched(a[..., :2 * 128], *st, params,
                                        chunk=128, interpret=True)
    y2, *st2 = gsc_block_pallas_batched(a[..., 2 * 128:], *st1, params,
                                        chunk=128, interpret=True)
    yc = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    scale = float(np.abs(np.asarray(full[0])).max())
    np.testing.assert_allclose(yc, np.asarray(full[0]),
                               atol=2e-6 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(st2[1]), np.asarray(full[2]),
                               atol=1e-6)


def test_block_cold_start_inf_scrub():
    """All-zero lead-in: mu hits the inf-scrub path (power 0) and the
    kernel must produce zeros, not NaN — same as the scan."""
    b, m, k = 1, 3, 128
    params = GscParams(mu0=0.001, mu_max=0.05, filter_size=k)
    rng = np.random.default_rng(2)
    a = np.zeros((b, m, 2 * 128), np.float32)
    a[..., 128:] = 0.2 * rng.standard_normal((b, m, 128))
    a = jnp.asarray(a)
    z = np.zeros
    out, *_ = gsc_block_pallas_batched(
        a, z((b, m - 1, k), np.float32), z((b, m - 1, k), np.float32),
        z((b, k), np.float32), z((b, m - 1, 8), np.float32),
        z((b, m - 1, 8), np.float32), params, chunk=128, interpret=True)
    st_ref, out_ref = run_scan(a, params, b)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-5)


def test_gsc_cross_solver_resume():
    """A checkpoint written by the scan path resumes on the block path with
    NO correction transient: every forward now refreshes gram/uold from the
    u stream at chunk boundaries (models/gsc.py:gram_refresh), so the block
    kernel's lookahead state is exact regardless of which solver wrote it."""
    from beamform_tpu.models.gsc import GscState, gram_refresh, gsc_sample_step

    b, m, k = 1, 4, 128
    half = 2 * 128
    params = GscParams(mu0=0.05, mu_max=0.1, filter_size=k)
    rng = np.random.default_rng(3)
    a = jnp.asarray(
        (0.3 * rng.standard_normal((b, m, 2 * half))).astype(np.float32))

    # ground truth: scan over the full stream
    _, out_full = run_scan(a, params, b)

    # first half on the SCAN path, with the model's boundary gram refresh
    def one(a_stream, gst):
        def step(st, a_t):
            return gsc_sample_step(st, a_t, params)
        new, out = jax.lax.scan(step, gst, jnp.moveaxis(a_stream, 0, 1))
        gram, uold = gram_refresh(gst.block, gst.uold,
                                  a_stream[1:] - a_stream[:-1], k)
        return GscState(new.block, new.filt, new.last_out, gram, uold), out

    st0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape),
        gsc_init_state(m, k, jnp.float32))
    st1, out1 = jax.vmap(one)(a[..., :half], st0)

    # second half resumed on the BLOCK path from the scan-written state
    out2, *_ = gsc_block_pallas_batched(
        a[..., half:], st1.block, st1.filt, st1.last_out, st1.gram,
        st1.uold, params, chunk=128, interpret=True)

    got = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)
    scale = float(jnp.abs(out_full).max())
    np.testing.assert_allclose(got, np.asarray(out_full),
                               atol=3e-5 * max(scale, 1.0))
