"""On-device component ablation for the MVDR hot path.

Times (on the real TPU, amortized like bench.py) the full MVDR model and
its isolated stages at bench shapes, to attribute the per-model xRT gap:
STFT, outer-product build, banded covariance matmul, Gauss-Jordan inverse,
and the RHS-refinement solve. Prints one line per stage:
``stage  seconds  equivalent-xRT``.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, args, k, force):
    """K chained dispatches, one forcing fetch (see bench.bench_model)."""
    acc = None
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
        acc = force(out) if acc is None else acc + force(out)
    float(acc)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--mics", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import aira16_xy, make_input
    from beamform_tpu.config import EngineConfig
    from beamform_tpu.models import get_model

    engine = EngineConfig(sample_rate=48000, window_size=1024,
                          dtype="float32")
    cfg = aira16_xy()
    params = dict(freq_mag_threshold=0.001, freq_max=16000, freq_min=100,
                  out_amp=1.0)
    model = get_model("mvdr", engine, cfg, params)
    x = make_input(args.mics, args.seconds, 48000)
    x = x[:, : x.shape[-1] // engine.hop * engine.hop]
    xd = jax.device_put(x)

    t = x.shape[-1] // engine.hop
    m = args.mics
    w = model.params.past_windows
    nib = len(model.ib)
    cb = model._block_frames(t)
    nblk = -(-t // cb)
    print(f"shapes: T={t} M={m} W={w} Nib={nib} CB={cb} nblk={nblk}",
          flush=True)

    def report(name, dt):
        xrt = args.repeats * args.seconds / dt
        print(f"{name:24s} {dt/args.repeats:8.4f}s/call  {xrt:9.1f} xRT",
              flush=True)

    # --- full model ---------------------------------------------------
    def full(xv):
        return model.process(xv, 20.0)[-5:].sum()
    full(xd)  # compile
    report("mvdr full", chain_time(full, (xd,), args.repeats, lambda o: o))

    # --- isolated stages ----------------------------------------------
    rng = np.random.default_rng(0)

    def randc(shape):
        # device-resident: the tunnel ships host arrays at ~15-20 MB/s, so
        # un-put inputs would make every stage measurement transfer-bound
        return (jax.device_put(rng.standard_normal(shape).astype(np.float32)),
                jax.device_put(rng.standard_normal(shape).astype(np.float32)))

    # stft of the whole chunk
    from beamform_tpu.models import common
    window = model.window

    @jax.jit
    def stft_stage(xv):
        spec, _ = common.stft_ext_carry(
            xv, engine, window, jnp.complex64,
            jnp.zeros((m, engine.hop), jnp.float32))
        return jnp.abs(spec[-1, -1, -5:]).sum()

    stft_stage(xd)
    report("stft", chain_time(stft_stage, (xd,), args.repeats, lambda o: o))

    # outer products + banded matmul, per block x nblk
    er, ei = randc((cb + w, m, nib))
    band_np = (np.tri(cb, cb + w, w - 1, dtype=np.float32)
               - np.tri(cb, cb + w, -1, dtype=np.float32))

    @jax.jit
    def outer_band(er, ei):
        ext = jax.lax.complex(er, ei)
        band = jnp.asarray(band_np)

        def blk(c, _):
            o = jnp.einsum("tmn,tkn->mktn", ext, jnp.conj(ext))
            g = jnp.einsum("ct,mktn->mkcn", band.astype(o.dtype), o,
                           precision=jax.lax.Precision.HIGHEST)
            return c + jnp.abs(g[0, 0, 0, :5]).sum(), None

        c, _ = jax.lax.scan(blk, 0.0, None, length=nblk)
        return c

    outer_band(er, ei)
    report("outer+band x nblk",
           chain_time(outer_band, (er, ei), args.repeats, lambda o: o))

    # Gauss-Jordan inverse, (M, M, CB*Nib) per block x nblk
    from beamform_tpu.kernels.linalg import gj_inverse_pallas_native
    b = cb * nib
    hr, hi = randc((w, m, b))

    @jax.jit
    def gj_stage(hr, hi):
        h = jax.lax.complex(hr, hi)
        rb = jnp.einsum("tmb,tkb->mkb", h, jnp.conj(h),
                        precision=jax.lax.Precision.HIGHEST)
        rb = rb + 10.0 * jnp.eye(m, dtype=jnp.float32)[:, :, None].astype(
            rb.dtype)   # keep it invertible; cost model only

        def blk(c, _):
            inv = gj_inverse_pallas_native(rb, polish=False)
            return c + jnp.abs(inv[0, 0, :5]).sum(), None

        c, _ = jax.lax.scan(blk, 0.0, None, length=nblk)
        return c

    gj_stage(hr, hi)
    report("gauss-jordan x nblk",
           chain_time(gj_stage, (hr, hi), args.repeats, lambda o: o))

    # refinement + solve einsums per block x nblk
    ir_, ii_ = randc((m, m, b))
    dr_, di_ = randc((b, m))

    @jax.jit
    def refine_stage(ir_, ii_, dr_, di_):
        inv = jax.lax.complex(ir_, ii_)
        rb = inv
        d = jax.lax.complex(dr_, di_)
        hp = jax.lax.Precision.HIGHEST

        def blk(c, _):
            x0 = jnp.einsum("mkb,bk->bm", inv, d, precision=hp)
            resid = d - jnp.einsum("mkb,bk->bm", rb, x0, precision=hp)
            num = x0 + jnp.einsum("mkb,bk->bm", inv, resid, precision=hp)
            den = jnp.einsum("bm,bm->b", jnp.conj(d), num, precision=hp)
            wv = num / den[:, None]
            return c + jnp.abs(wv[0, :5]).sum(), None

        c, _ = jax.lax.scan(blk, 0.0, None, length=nblk)
        return c

    refine_stage(ir_, ii_, dr_, di_)
    report("refine+solve x nblk",
           chain_time(refine_stage, (ir_, ii_, dr_, di_), args.repeats,
                      lambda o: o))


if __name__ == "__main__":
    main()
