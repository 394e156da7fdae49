"""Prototype: exact block factorization of the GSC adaptive recurrence.

Validates (in float64, algebraically) that the lookahead-L block form
reproduces the reference per-sample LMS recurrence (gsc.cpp:120-179)
before it is committed to a Pallas kernel:

per L-sample group with filters frozen at the group start,

  out[t] = d[t] - sum_c <g_c(t0), b_c(t)>              (base dots)
           - sum_{s=t0..t-1} sum_c w_c[s] <b_c(s), b_c(t)>   (lag Grams)

where w_c[s] = mu_c[s] * out[s] is the scalar update weight (mu gating,
inf scrub and the VAD gate all evaluated on the scalar side), and the
rank-L filter update g += sum_s w[s] b(s) lands at the group boundary.
<b_c(s), b_c(t)> are sliding lag autocorrelations of the blocking
channels — precomputable from the input alone.

Run: python tools/gsc_block_proto.py
"""

import numpy as np


def scan_reference(u, d, g0, lo0, mu0, mu_max, use_vad=False,
                   vad_threshold=0.1):
    """Per-sample recurrence exactly as models/gsc.py gsc_sample_step
    (block register pre-filled with the last K-1 u's implied zero here:
    u is the full stream; b(t) windows read directly from u)."""
    c, s = u.shape
    k = g0.shape[-1]
    up = np.concatenate([np.zeros((c, k - 1)), u], axis=1)  # zero history
    g = g0.copy()
    lo = lo0.copy()
    out = np.zeros(s)
    for t in range(s):
        b = up[:, t:t + k]                          # (C, K) windows
        das = d[t]
        y = das - np.sum(g * b)
        out[t] = y
        lo = np.concatenate([lo[1:], [y]])
        osq = np.sum(lo ** 2)
        if use_vad and np.sqrt(osq / k) >= vad_threshold:
            continue
        bsq = np.sum(b ** 2, axis=1)                # (C,)
        cond = (mu0 * mu0) * bsq < (mu_max * mu_max) * osq
        den = np.where(cond, osq, bsq) / k
        with np.errstate(divide="ignore"):
            mu = mu0 / np.sqrt(den)
        mu = np.where(np.isfinite(mu), mu, 0.0)
        g = g + mu[:, None] * y * b
        g = np.where(np.isnan(g), 0.0, g)
    return out, g, lo


def block_form(u, d, g0, lo0, mu0, mu_max, L=8, use_vad=False,
               vad_threshold=0.1):
    """Exact lookahead-L block factorization."""
    c, s = u.shape
    k = g0.shape[-1]
    assert s % L == 0
    up = np.concatenate([np.zeros((c, k - 1)), u], axis=1)

    # precomputable from input alone: windows dot products at lags < L
    # gram[l][c, t] = <b_c(t - l), b_c(t)>, and bsq[c, t] = <b_c(t), b_c(t)>
    def window(t):
        return up[:, t:t + k]

    g = g0.copy()
    lo = lo0.copy()
    out = np.zeros(s)
    for t0 in range(0, s, L):
        w_grp = np.zeros((c, L))
        b_grp = [window(t0 + i) for i in range(L)]
        base = np.array([d[t0 + i] - np.sum(g * b_grp[i]) for i in range(L)])
        for i in range(L):
            t = t0 + i
            y = base[i]
            for j in range(i):                      # lag corrections
                gram = np.sum(b_grp[j] * b_grp[i], axis=1)   # (C,)
                y = y - np.sum(w_grp[:, j] * gram)
            out[t] = y
            lo = np.concatenate([lo[1:], [y]])
            osq = np.sum(lo ** 2)
            if use_vad and np.sqrt(osq / k) >= vad_threshold:
                continue                            # w stays 0
            bsq = np.sum(b_grp[i] ** 2, axis=1)
            cond = (mu0 * mu0) * bsq < (mu_max * mu_max) * osq
            den = np.where(cond, osq, bsq) / k
            with np.errstate(divide="ignore"):
                mu = mu0 / np.sqrt(den)
            mu = np.where(np.isfinite(mu), mu, 0.0)
            w_grp[:, i] = mu * y
        # rank-L filter refresh at the group boundary
        g = g + sum(w_grp[:, i:i + 1] * b_grp[i] for i in range(L))
        g = np.where(np.isnan(g), 0.0, g)
    return out, g, lo


def main():
    rng = np.random.default_rng(0)
    c, k, s, L = 3, 32, 256, 8
    u = 0.3 * rng.standard_normal((c, s))
    d = 0.3 * rng.standard_normal(s)
    g0 = 0.01 * rng.standard_normal((c, k))
    lo0 = np.zeros(k)

    for mu0, mu_max, vad in [(1e-4, 0.1, False), (0.05, 0.1, False),
                             (0.5, 0.02, False), (1e-4, 0.1, True)]:
        y1, g1, lo1 = scan_reference(u, d, g0, lo0, mu0, mu_max,
                                     use_vad=vad, vad_threshold=0.2)
        y2, g2, lo2 = block_form(u, d, g0, lo0, mu0, mu_max, L=L,
                                 use_vad=vad, vad_threshold=0.2)
        dy = np.abs(y1 - y2).max() / max(np.abs(y1).max(), 1e-12)
        dg = np.abs(g1 - g2).max() / max(np.abs(g1).max(), 1e-12)
        print(f"mu0={mu0} mu_max={mu_max} vad={vad}: "
              f"out rel {dy:.2e}, g rel {dg:.2e}")
        assert dy < 1e-12 and dg < 1e-12, "NOT EXACT"

    # cold start (all-zero input -> inf mu scrub path)
    u0 = np.zeros((c, s))
    u0[:, 64:] = 0.3 * rng.standard_normal((c, s - 64))
    d0 = np.concatenate([np.zeros(64), 0.3 * rng.standard_normal(s - 64)])
    y1, g1, _ = scan_reference(u0, d0, np.zeros((c, k)), lo0, 1e-4, 0.1)
    y2, g2, _ = block_form(u0, d0, np.zeros((c, k)), lo0, 1e-4, 0.1, L=L)
    print("cold start:", np.abs(y1 - y2).max(), np.abs(g1 - g2).max())
    assert np.abs(y1 - y2).max() < 1e-12
    print("EXACT: block factorization == per-sample recurrence")


if __name__ == "__main__":
    main()
