"""Deviation budget of a window-frozen q-branch GSC (roadmap path b).

Exact recurrence vs one where q_c (the NLMS-branch step mu0/rms(u_c win))
is held constant within each 128-sample block (value at block start).
That freezing is what would let a block-factorized kernel use
channel-combined gram corrections. Measured on the model's real stage-1
output (aligned streams) for speech-like and white input.
"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp

from bench import make_speech_input, make_input, aira16_xy, LAUNCH
from beamform_tpu.config import EngineConfig, GscParams
from beamform_tpu.models import get_model
from beamform_tpu.models.gsc import gsc_init_state, gsc_sample_step

K = 128
engine = EngineConfig(sample_rate=48000, window_size=1024, dtype="float32")
params = GscParams(mu0=0.0001, mu_max=0.1, filter_size=K)
cfg = aira16_xy()

def scan_variant(aligned, frozen_q):
    """aligned (S, M). frozen_q: q_c refreshed only at block boundaries."""
    m = aligned.shape[1]
    st = gsc_init_state(m, K, jnp.float32)
    mu0 = np.float32(params.mu0)
    c_b = np.float32(params.mu0 ** 2 / K)
    c_o = np.float32(params.mu_max ** 2 / K)
    kinv = np.float32(1.0 / K)

    def step(carry, inp):
        st, qfro = carry
        a_t, j = inp
        das = jnp.mean(a_t)
        u_new = a_t[1:] - a_t[:-1]
        block = jnp.concatenate([st.block[:, 1:], u_new[:, None]], axis=1)
        out = das - jnp.sum(st.filt * block)
        last = jnp.concatenate([st.last_out[1:], out[None]])
        osq = jnp.sum(last ** 2)
        bsq = jnp.sum(block ** 2, axis=1)
        q_now = mu0 * jax.lax.rsqrt(jnp.maximum(bsq * kinv, 0.0))
        q_now = jnp.where(q_now < jnp.inf, q_now, 0.0)
        qfro = jnp.where(j % 128 == 0, q_now, qfro) if frozen_q else q_now
        cond = (c_b * bsq) < (c_o * osq)
        p_raw = mu0 * jax.lax.rsqrt(jnp.maximum(osq * kinv, 0.0))
        p = jnp.where(p_raw < jnp.inf, p_raw, 0.0)
        mu = jnp.where(cond, p, qfro)
        filt = st.filt + mu[:, None] * out * block
        filt = jnp.where(jnp.isnan(filt), 0.0, filt)
        st2 = type(st)(block, filt, last, st.gram, st.uold)
        return (st2, qfro), out

    qf0 = jnp.zeros((m - 1,), jnp.float32)
    idx = jnp.arange(aligned.shape[0])
    (_, _), outs = jax.lax.scan(step, (st, qf0), (aligned, idx))
    return np.asarray(outs)

rngf = np.random.default_rng(11)
def speech_floor(m, sec, fs):
    x = make_speech_input(m, sec, fs)
    return x + 1e-3 * rngf.standard_normal(x.shape).astype(np.float32)
for label, maker in (("speech", make_speech_input),
                     ("speech+floor", speech_floor),
                     ("white", make_input)):
    x = maker(16, 2.0, 48000)
    x = np.ascontiguousarray(x[:, :x.shape[1] // 1024 * 1024])
    model = get_model("gsc", engine, cfg, dict(LAUNCH["gsc"]))
    carry, _ = model.stream_init()
    aligned, _ = model.aligned_streams(
        jnp.asarray(x), jnp.asarray([20.0]),
        jnp.zeros(x.shape[1] // 1024, int), carry)
    a = np.asarray(aligned).T.astype(np.float32)       # (S, M)
    y_exact = scan_variant(jnp.asarray(a), frozen_q=False)
    y_frozen = scan_variant(jnp.asarray(a), frozen_q=True)
    scale = np.abs(y_exact).max()
    dev = np.abs(y_frozen - y_exact).max() / scale
    rms = np.sqrt(np.mean((y_frozen - y_exact) ** 2)) / scale
    print(f"{label}: frozen-q max rel dev {dev:.2e}, rms {rms:.2e} "
          f"(scale {scale:.4f})")
