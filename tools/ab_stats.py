"""Shared paired-A/B statistics for the endpoint experiments.

One implementation for tools/endpoint_ab.py and tools/endpoint_ab_sfat.py
(previously duplicated, with an anti-conservative t fallback for 7<=n<=9).
Exact two-sided 95% Student-t quantiles via scipy when available; otherwise a
dof-exact table for n<=31 and a CONSERVATIVE (next-lower-dof) fallback above.
"""

import numpy as np

try:
    from scipy.stats import t as _student_t
except Exception:  # pragma: no cover - scipy is present in this image
    _student_t = None

# two-sided 95% quantiles, index = dof (n-1); used when scipy is absent
_T95 = {
    1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447, 7: 2.365,
    8: 2.306, 9: 2.262, 10: 2.228, 11: 2.201, 12: 2.179, 13: 2.160,
    14: 2.145, 15: 2.131, 16: 2.120, 17: 2.110, 18: 2.101, 19: 2.093,
    20: 2.086, 21: 2.080, 22: 2.074, 23: 2.069, 24: 2.064, 25: 2.060,
    26: 2.056, 27: 2.052, 28: 2.048, 29: 2.045, 30: 2.042,
}


def t95(n: int) -> float:
    """Two-sided 95% t quantile for a paired sample of size n (dof n-1)."""
    dof = n - 1
    if dof < 1:
        raise ValueError("paired CI needs n >= 2")
    if _student_t is not None:
        return float(_student_t.ppf(0.975, dof))
    if dof in _T95:
        return _T95[dof]
    # conservative: the largest tabulated dof not exceeding this one
    return _T95[max(k for k in _T95 if k <= dof)]


def paired_stats(a, b) -> dict:
    """Paired-difference summary for per-seed arms a[i] vs b[i] (arm i shares
    init + batch stream, so the difference cancels the common seed effect)."""
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    n = len(d)
    se = float(d.std(ddof=1) / np.sqrt(n))
    q = t95(n)
    return {
        "n": n,
        "mean_delta": float(d.mean()),
        "se": se,
        "ci95_half_width": float(q * se),
        "ci95": [float(d.mean() - q * se), float(d.mean() + q * se)],
    }
