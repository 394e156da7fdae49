"""Stage-by-stage timing of the dense MVDR path on the real chip."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_input, aira16_xy, LAUNCH  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from beamform_tpu.config import EngineConfig, MvdrParams  # noqa: E402
from beamform_tpu.models import get_model  # noqa: E402
from beamform_tpu.models import common  # noqa: E402
from beamform_tpu.models.mvdr import white_r  # noqa: E402

SECONDS = 20.0
cfg = aira16_xy()
x = make_input(16, SECONDS, 48000)
engine = EngineConfig(sample_rate=48000, window_size=1024, dtype="float32")
params = dict(LAUNCH["mvdr"], solver="dense")
model = get_model("mvdr", engine, cfg, params)
x = x[:, :x.shape[-1] // 1024 * 1024]
xd = jax.device_put(jnp.asarray(x))
p = model.params
m = 16
w_hist = p.past_windows
cb = model._block_frames(int(x.shape[-1] // 1024))
print(f"cb={cb} w={w_hist} nib={len(model.ib)}", file=sys.stderr)


def timeit(fn, *a, repeats=4):
    out = fn(*a)
    float(jnp.abs(jax.tree.leaves(out)[0].ravel()[-1]).astype(jnp.float32))
    acc = None
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        s = jnp.abs(leaf.ravel()[-1]).astype(jnp.float32)
        acc = s if acc is None else acc + s
    float(acc)
    return (time.perf_counter() - t0) / repeats


state = model.stream_init()
th = common.theta_per_frame(20.0, int(x.shape[-1] // 1024))
uniq, w_idx = common.unique_thetas(th)
uniq = uniq.astype(np.float32)

t_full = timeit(jax.jit(model._forward), xd, uniq, w_idx, state)
print(f"full forward        : {t_full * 1e3:8.2f} ms")


@jax.jit
def stft_only(x, thetas, w_idx, state):
    carry, hist0 = state
    x_spec, tail = common.stft_ext_carry(x, model.engine, model.window,
                                         model.cdtype, carry.tail)
    return x_spec


t_stft = timeit(stft_only, xd, uniq, w_idx, state)
print(f"stft                : {t_stft * 1e3:8.2f} ms")

# precompute spectra once for stage isolation (all on device: complex64
# cannot cross host<->device through the tunnel)
nib = len(model.ib)
t = int(x.shape[-1] // 1024)
tpad = -(-t // cb) * cb


@jax.jit
def make_blocks(x, thetas, w_idx, state):
    x_spec = stft_only(x, thetas, w_idx, state)
    x_ib = x_spec[:, :, jnp.asarray(model.ib)]
    x_blk = jnp.pad(x_ib, ((0, tpad - t), (0, 0), (0, 0)))
    return x_blk.reshape(tpad // cb, cb, m, nib)


x_blk = make_blocks(xd, uniq, w_idx, state)
x_blk.block_until_ready()
wr = np.ones((m, m), np.float32) + 0.001 * np.eye(m, dtype=np.float32)
band = (np.tri(cb, cb + w_hist, w_hist - 1, dtype=np.float32)
        - np.tri(cb, cb + w_hist, -1, dtype=np.float32))
hist0 = common.device_zeros((w_hist, m, nib), jnp.complex64)
hp = jax.lax.Precision.HIGHEST


@jax.jit
def cov_only(x_blk, hist0):
    def step(hist, xb):
        ext = jnp.concatenate([hist, xb], axis=0)
        o = jnp.einsum("tmn,tkn->mktn", ext, jnp.conj(ext))
        g = jnp.einsum("ct,mktn->mkcn", band.astype(o.dtype), o,
                       precision=hp)
        r = g * wr.astype(g.dtype)[:, :, None, None]
        return ext[cb:], r.reshape(m, m, cb * nib)

    return jax.lax.scan(step, hist0, x_blk)


t_cov = timeit(cov_only, x_blk, hist0)
print(f"cov (outer+banded)  : {t_cov * 1e3:8.2f} ms")


@jax.jit
def cov_inv(x_blk, hist0):
    from beamform_tpu.kernels.linalg import gj_inverse_pallas_native

    def step(hist, xb):
        ext = jnp.concatenate([hist, xb], axis=0)
        o = jnp.einsum("tmn,tkn->mktn", ext, jnp.conj(ext))
        g = jnp.einsum("ct,mktn->mkcn", band.astype(o.dtype), o,
                       precision=hp)
        r = g * wr.astype(g.dtype)[:, :, None, None]
        rb = r.reshape(m, m, cb * nib)
        inv = gj_inverse_pallas_native(rb, polish=False)
        return ext[cb:], inv

    return jax.lax.scan(step, hist0, x_blk)


t_inv = timeit(cov_inv, x_blk, hist0)
print(f"cov + GJ inverse    : {t_inv * 1e3:8.2f} ms "
      f"(inverse alone ~{(t_inv - t_cov) * 1e3:.2f})")
print(f"apply/solve + rest  ~ {(t_full - t_stft - t_inv) * 1e3:8.2f} ms")
