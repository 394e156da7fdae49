"""Prototype of the channel-common fast-path GSC factorization — a
recorded DISPROOF.

The sketched design assumed a filter update at sample s stops influencing
outputs once the windows no longer overlap (lag >= K). That is FALSE for
this recurrence: the correction gram is the REGISTER-ALIGNED dot
G[t,s] = sum_k u[s-k]u[t-k] (component k of the filter pairs with
component k of the current window), which never structurally vanishes
with lag — e.g. G[t, t-K] = u[t-K]u[t] != 0 — and for broadband u it does
not even decay. Running this prototype shows it: outputs match the exact
recurrence bit-for-f64 until exactly t = K = 128, then drift to ~5.6e-2
relative as ever more beyond-the-register-depth corrections are dropped.
Folding the filter more often to bound the reach reinstates exactly the
per-sample rank-1/dot cost the factorization was built to escape (the
lookahead-8 kernel, kernels/gsc_block.py, is that trade at L=8 and
measured a loss). Conclusion in docs/ROADMAP.md: exact GSC stays on the
per-sample kernel; no gram-space shortcut exists for this mu rule.

The (broken) factorization, against a direct transliteration of the
reference recurrence (gsc.cpp:120-179):

- base[t] = das[t] - sum_c <flt_chunk_start_c, b_c(t)>  (an XLA conv in
  the real kernel; windows vanish for lags >= K, so corrections never
  reach further back than K-1 samples),
- in-chunk corrections ride ONE channel-summed sliding gram
  Gsum[t, t-l] = sum_c <b_c(t-l), b_c(t)> maintained by the packed
  difference stream dg_sum[t, l] = sum_c (u_c[t]u_c[t-l] -
  u_c[t-K]u_c[t-K-l]) (precomputable, input-only),
- the p-branch step is channel-COMMON (w[s] = out[s]*mu_p[s]); q-branch
  exceptions (block power >= (mu_max/mu0)^2 x output power — measured
  practically dead on launch params, tools/gsc_frozen_q.py) contribute
  their in-window corrections via the same channel-summed gram with the
  channel-MEAN delta (the one approximation), while the chunk-boundary
  filter reconstruction uses the exact per-channel weights
  flt_c += sum_s w_c[s] u_c[s-k] (an XLA correlation in the real kernel).

Run: python tools/gsc_fastpath_proto.py  -> max |factorized - exact| per
input class (~5.6e-2: the disproof, not round-off).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

K = 128
MU0, MU_MAX = 1e-4, 0.1
C_B, C_O = MU0 * MU0 / K, MU_MAX * MU_MAX / K
KINV = 1.0 / K


def exact_scan(aligned):
    """Direct gsc.cpp:120-179 recurrence (float64, fresh block powers)."""
    s_len, m = aligned.shape
    c = m - 1
    blk = np.zeros((c, K))
    flt = np.zeros((c, K))
    lo = np.zeros(K)
    out = np.zeros(s_len)
    for t in range(s_len):
        a = aligned[t]
        das = a.mean()
        u_new = a[1:] - a[:-1]
        blk = np.concatenate([blk[:, 1:], u_new[:, None]], axis=1)
        out[t] = das - np.sum(flt * blk)
        lo = np.concatenate([lo[1:], out[t:t + 1]])
        osq = np.sum(lo * lo)
        bsq = np.sum(blk * blk, axis=1)
        with np.errstate(divide="ignore"):
            p = MU0 / np.sqrt(max(osq * KINV, 0.0)) if osq > 0 else np.inf
            q = np.where(bsq > 0, MU0 / np.sqrt(bsq * KINV), np.inf)
        cond = (C_B * bsq) < (C_O * osq)
        mu = np.where(cond, p, q)
        mu = np.where(np.isfinite(mu), mu, 0.0)
        flt = flt + mu[:, None] * out[t] * blk
        flt[np.isnan(flt)] = 0.0
    return out, flt


def factorized(aligned, chunk=512):
    """The fast-path factorization, chunked with exact filter handoff."""
    s_len, m = aligned.shape
    c = m - 1
    u_all = (aligned[:, 1:] - aligned[:, :-1]).T          # (C, S)
    das_all = aligned.mean(axis=1)
    flt = np.zeros((c, K))
    lo = np.zeros(K)
    u_hist = np.zeros((c, K))                              # last K u's
    out = np.zeros(s_len)

    # ---- XLA side: the packed channel-summed gram difference stream,
    # over the WHOLE stream (zero initial history): dg_sum[t, l] =
    # sum_c u[t]u[t-l] - u[t-K]u[t-K-l]
    up = np.concatenate([np.zeros((c, 2 * K)), u_all], axis=1)
    dg_all = np.zeros((s_len, K))
    for l in range(K):
        i = 2 * K + np.arange(s_len)
        dg_all[:, l] = np.sum(up[:, i] * up[:, i - l]
                              - up[:, i - K] * up[:, i - K - l], axis=0)
    gacc = np.zeros(K)            # Gsum[t, t-l], carried across chunks

    for c0 in range(0, s_len, chunk):
        c1 = min(s_len, c0 + chunk)
        n = c1 - c0
        u = u_all[:, c0:c1]
        u_ext = np.concatenate([u_hist, u], axis=1)        # (C, K+n)

        # ---- XLA side: base dots vs the chunk-start filter -------------
        base = np.empty(n)
        for t in range(n):
            win = u_ext[:, t + 1:t + 1 + K]                # b_c(t)
            base[t] = das_all[c0 + t] - np.sum(flt * win)

        dg = dg_all[c0:c1]

        # XLA side: exact per-channel block powers (input-only)
        bsq = np.empty((c, n))
        for t in range(n):
            w_ = u_ext[:, t + 1:t + 1 + K]
            bsq[:, t] = np.sum(w_ * w_, axis=1)
        with np.errstate(divide="ignore"):
            q_all = np.where(bsq > 0, MU0 / np.sqrt(bsq * KINV), np.inf)

        # ---- serial phase: packed rows only -----------------------------
        wreg = np.zeros(K)          # w[t-l] channel-common weights
        wfull = np.zeros((c, n))    # exact per-channel weights (XLA recon)
        exc = 0
        for t in range(n):
            gacc = gacc + dg[t]     # gacc[l] = Gsum[t, t-l]
            # wreg[j] = w[t-1-j], so lag l = j+1 pairs wreg[j] with
            # gacc[j+1]; lag 0 (the not-yet-known w[t]) is excluded
            corr = np.sum(wreg[:-1] * gacc[1:])
            out[c0 + t] = base[t] - corr
            lo = np.concatenate([lo[1:], out[c0 + t:c0 + t + 1]])
            osq = np.sum(lo * lo)
            with np.errstate(divide="ignore"):
                p = MU0 / np.sqrt(osq * KINV) if osq > 0 else np.inf
            p = p if np.isfinite(p) else 0.0
            cond = (C_B * bsq[:, t]) < (C_O * osq)
            mu_c = np.where(cond, p, q_all[:, t])
            mu_c = np.where(np.isfinite(mu_c), mu_c, 0.0)
            w_c = mu_c * out[c0 + t]                       # exact, (C,)
            wfull[:, t] = w_c
            w_common = p * out[c0 + t] if np.isfinite(p) else 0.0
            delta = w_c - w_common
            if np.any(delta != 0.0):
                exc += 1
            # the ONE approximation: exception deltas ride the summed gram
            # with their channel mean
            w_eff = w_common + delta.mean()
            wreg = np.concatenate([[w_eff], wreg[:-1]])

        # ---- XLA side: exact per-channel filter reconstruction ---------
        for t in range(n):
            win = u_ext[:, t + 1:t + 1 + K]
            flt = flt + wfull[:, t:t + 1] * win
            flt[np.isnan(flt)] = 0.0
        u_hist = u_ext[:, -K:]

    return out, flt, exc


def main():
    rng = np.random.default_rng(0)
    s_len, m = 2048, 8

    cases = {}
    cases["white"] = 0.2 * rng.standard_normal((s_len, m))
    sp = 0.2 * rng.standard_normal((s_len, m))
    sp[400:900] *= 1e-4           # near-silent gap (q-branch candidates)
    cases["gappy"] = sp

    for label, x in cases.items():
        y_ref, flt_ref = exact_scan(x)
        y_fac, flt_fac, exc = factorized(x)
        scale = np.abs(y_ref).max()
        dev = np.abs(y_fac - y_ref).max() / scale
        fdev = np.abs(flt_fac - flt_ref).max() / max(np.abs(flt_ref).max(),
                                                     1e-30)
        print(f"{label:6s}: out dev {dev:.2e}  filter dev {fdev:.2e}  "
              f"exceptions {exc}/{s_len}")


if __name__ == "__main__":
    main()
