"""GSC Pallas kernel vs the lax.scan formulation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beamform_tpu.config import GscParams
from beamform_tpu.kernels.gsc_pallas import gsc_adaptive_pallas
from beamform_tpu.models.gsc import gsc_init_state, gsc_sample_step


def run_scan(aligned, state, params):
    def step(st, a_t):
        return gsc_sample_step(st, a_t, params)
    state, out = jax.lax.scan(step, state, aligned)
    return out, state


@pytest.mark.parametrize("use_vad", [False, True])
def test_pallas_matches_scan(use_vad):
    m, k, chunk = 4, 128, 128
    s = 4 * chunk
    params = GscParams(mu0=0.0005, mu_max=0.05, filter_size=k,
                       use_vad=use_vad, vad_threshold=0.05)
    rng = np.random.default_rng(0)
    aligned = (0.2 * rng.standard_normal((s, m))).astype(np.float32)
    st = gsc_init_state(m, k, jnp.float32)

    out_ref, st_ref = run_scan(jnp.asarray(aligned), st, params)
    out_k, blk, flt, lo = gsc_adaptive_pallas(
        jnp.asarray(aligned).T, st.block, st.filt, st.last_out, params,
        chunk=chunk, interpret=True)

    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(flt), np.asarray(st_ref.filt),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(st_ref.block),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(st_ref.last_out),
                               atol=2e-5)


def test_pallas_state_continuity():
    """Two kernel invocations chain state exactly like one long run."""
    m, k, chunk = 3, 128, 128
    params = GscParams(mu0=0.001, mu_max=0.05, filter_size=k)
    rng = np.random.default_rng(1)
    a = (0.1 * rng.standard_normal((4 * chunk, m))).astype(np.float32)
    st = gsc_init_state(m, k, jnp.float32)

    at = jnp.asarray(a).T
    full, blk, flt, lo = gsc_adaptive_pallas(
        at, st.block, st.filt, st.last_out, params,
        chunk=chunk, interpret=True)
    y1, b1, f1, l1 = gsc_adaptive_pallas(
        at[:, :2 * chunk], st.block, st.filt, st.last_out, params,
        chunk=chunk, interpret=True)
    y2, b2, f2, l2 = gsc_adaptive_pallas(
        at[:, 2 * chunk:], b1, f1, l1, params,
        chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(full),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(flt), atol=1e-6)


@pytest.mark.parametrize("use_vad", [False, True])
def test_xmu_matches_scan(use_vad):
    """The xmu strategy (input-only mu quantities hoisted to XLA) runs the
    identical recurrence: its block powers are exact fresh-per-sample
    windowed sums (like the scan's calculate_power), so agreement is at
    the same f32 round-off as the incremental kernel."""
    from beamform_tpu.kernels.gsc_pallas import gsc_adaptive_pallas_xmu
    m, k, chunk = 4, 128, 128
    s = 4 * chunk
    params = GscParams(mu0=0.0005, mu_max=0.05, filter_size=k,
                       use_vad=use_vad, vad_threshold=0.05)
    rng = np.random.default_rng(0)
    aligned = (0.2 * rng.standard_normal((s, m))).astype(np.float32)
    st = gsc_init_state(m, k, jnp.float32)

    out_ref, st_ref = run_scan(jnp.asarray(aligned), st, params)
    out_k, blk, flt, lo = gsc_adaptive_pallas_xmu(
        jnp.asarray(aligned).T[None], st.block[None], st.filt[None],
        st.last_out[None], params, chunk=chunk, interpret=True)

    np.testing.assert_allclose(np.asarray(out_k[0]), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(flt[0]), np.asarray(st_ref.filt),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(blk[0]),
                               np.asarray(st_ref.block), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lo[0]),
                               np.asarray(st_ref.last_out), atol=2e-5)
