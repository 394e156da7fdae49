"""Minimal repro driver for the axon worker fault around the LCMV mega
program (docs/ROADMAP.md item 2).

Round-3 finding: loading the LCMV mega Pallas program intermittently
(~40-50% per fresh process) crashed the TPU worker UNLESS an
`optimization_barrier` separates the constraint build from the kernel call
(models/lcmv.py:_forward_mega). Scoped-VMEM size, fb, SEG and internal
scratch were ruled out; the trigger is the surrounding XLA program.

This tool runs ONE LCMV mega forward in the current process, with the
barrier controlled by argv, and prints OK — the shell loop around it counts
fresh-process fault rates:

    for i in $(seq 10); do
        python tools/axon_fault_repro.py nobarrier || echo FAULT
    done

Variants:
    barrier    - production behavior (barrier in place)
    nobarrier  - barrier removed (optimization_barrier monkeypatched to
                 identity BEFORE tracing)
    constctrl  - constraints precomputed on host (numpy) and fed as a
                 device constant: if this never faults, the trigger is the
                 on-device constraint-build program fusing into the
                 custom-call operand staging, not the kernel itself
"""

import os
import sys

import numpy as np


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "nobarrier"
    import jax
    # same persistent compile cache as bench.py (.jax_cache): cached
    # compiles keep trials fast, and the fault is a program-LOAD event so
    # the cache does not mask it
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if mode == "nobarrier":
        jax.lax.optimization_barrier = lambda x: x

    import beamform_tpu as bt
    from beamform_tpu.config import EngineConfig

    cfg_path = os.path.join(os.path.dirname(__file__), os.pardir,
                            "beamform_tpu", "configs", "aira16.yaml")
    cfg = bt.load_array_config(cfg_path)
    eng = EngineConfig()
    rng = np.random.default_rng(0)
    x = (0.1 * rng.standard_normal((16, 8 * 1024))).astype(np.float32)
    params = dict(freq_mag_threshold=0.001, freq_max=16000, freq_min=100,
                  out_amp=1.0, solver="mega")

    if mode == "constctrl":
        # Pre-resolve the constraint planes EAGERLY (outside jit) so the
        # kernel's ctrl operands arrive as jit ARGUMENTS — the on-device
        # constraint-build subprogram is absent from the compiled program.
        import jax.numpy as jnp
        from beamform_tpu.models import get_model
        model = get_model("lcmv", eng, cfg, params)
        assert model._strategy() == "mega", model._strategy()
        carry, hist0 = model.stream_init()
        t = x.shape[1] // eng.hop
        u_th, u_ang, u_act, u_r0, idx = model._control_arrays(20.0, t, None)
        c = model._constraints_traced(
            jnp.asarray(u_th), jnp.asarray(u_ang),
            jnp.asarray(u_act), jnp.asarray(u_r0))       # eager, on device
        c_k = jax.block_until_ready(jnp.moveaxis(c, (1, 2, 3), (3, 2, 1)))
        from beamform_tpu.kernels.mega_stream import lcmv_mega

        @jax.jit
        def f(x_, tail_, prev_, hist_, ck_, idx_):
            return lcmv_mega(x_, tail_, prev_, hist_, ck_, idx_,
                             model.ib, eng.fft_win,
                             model.params.past_windows,
                             model.params.freq_mag_threshold)

        audio, hist, prev = f(jnp.asarray(x), carry.tail, carry.out_prev,
                              hist0, c_k, jnp.asarray(idx))
        y = np.asarray(audio)
    else:
        y = np.asarray(bt.run_offline("lcmv", x, engine=eng, array_cfg=cfg,
                                      theta=20.0, params=params))
    # NaN output is acceptable here (cold covariance, faithfully singular);
    # the repro only cares that execution did not crash the worker.
    print(f"OK mode={mode} out={y.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
