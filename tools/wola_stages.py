"""In-context WOLA / DAS stage timing on the real chip."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_input, aira16_xy  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from beamform_tpu.config import EngineConfig  # noqa: E402
from beamform_tpu.models import get_model, common  # noqa: E402

SECONDS = 20.0
cfg = aira16_xy()
x = make_input(16, SECONDS, 48000)
x = x[:, :x.shape[-1] // 1024 * 1024]
engine = EngineConfig(sample_rate=48000, window_size=1024, dtype="float32")
model = get_model("das", engine, cfg, {})
xd = jax.device_put(jnp.asarray(x))


def timeit(fn, *a, repeats=8):
    out = fn(*a)
    float(jnp.abs(jax.tree.leaves(out)[0].ravel()[-1]).astype(jnp.float32))
    t0 = time.perf_counter()
    accs = []
    for _ in range(repeats):
        out = fn(*a)
        accs.append(jax.tree.leaves(out)[0])
    s = sum(jnp.abs(v.ravel()[-1]).astype(jnp.float32) for v in accs)
    float(s)
    return (time.perf_counter() - t0) / repeats


state = model.stream_init()
th = common.theta_per_frame(20.0, int(x.shape[-1] // 1024))
uniq, w_idx = common.unique_thetas(th)
uniq = uniq.astype(np.float32)

t_full = timeit(jax.jit(model._forward), xd, uniq, w_idx, state)
print(f"das full            : {t_full * 1e3:7.2f} ms "
      f"({SECONDS / t_full:.0f}x RT)")


@jax.jit
def stft_only(x, state):
    carry = state if isinstance(state, common.WolaCarry) else state[0]
    x_spec, tail = common.stft_ext_carry(x, model.engine, model.window,
                                         model.cdtype, carry.tail)
    # tiny reduction so we don't materialize the complex spectra to a
    # fetchable output (and XLA can't dead-code it)
    return jnp.abs(x_spec[..., -1]).sum()


t_stft = timeit(stft_only, xd, state)
print(f"stft (reduced)      : {t_stft * 1e3:7.2f} ms")


@jax.jit
def stft_mag(x, state):
    carry = state if isinstance(state, common.WolaCarry) else state[0]
    x_spec, tail = common.stft_ext_carry(x, model.engine, model.window,
                                         model.cdtype, carry.tail)
    n = model.engine.fft_win
    mag = common.mag_mean_over_mics(x_spec, n)
    return mag[..., -1].sum()


t_mag = timeit(stft_mag, xd, state)
print(f"stft + mag          : {t_mag * 1e3:7.2f} ms")


@jax.jit
def roundtrip(x, state):
    carry = state if isinstance(state, common.WolaCarry) else state[0]
    x_spec, tail = common.stft_ext_carry(x, model.engine, model.window,
                                         model.cdtype, carry.tail)
    y = x_spec[:, 0, :]                      # (T, NB) pick mic 0
    out, prev = common.istft_ext_carry(y, model.engine, model.window,
                                       carry.out_prev)
    return out


t_rt = timeit(roundtrip, xd, state)
print(f"stft+istft roundtrip: {t_rt * 1e3:7.2f} ms")
