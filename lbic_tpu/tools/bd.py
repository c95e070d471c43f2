"""Bjøntegaard-delta metrics (BD-rate / BD-PSNR).

Native implementation of what the reference gets from the external
`bjontegaard` pip package (utils/bjontegaard_get.py:97-98: akima
interpolation variant): integrate the difference of the two RD curves in
(log-rate, psnr) space over the overlapping quality interval."""

import numpy as np
from scipy.interpolate import Akima1DInterpolator, PchipInterpolator


def _interp(x, y):
    """Akima like the reference (bjontegaard pip pkg); curves with too
    few points for Akima's quintic end conditions fall back to PCHIP
    (monotone cubic — same integral to first order on sparse curves)."""
    return (Akima1DInterpolator(x, y) if len(x) >= 5
            else PchipInterpolator(x, y))


def _dedup(x, y):
    """Collapse duplicate x values (e.g. Pillow clamps very low JPEG
    qualities to the same file) — interpolators need strictly
    increasing abscissae."""
    ux, inv = np.unique(x, return_inverse=True)
    uy = np.zeros_like(ux)
    np.add.at(uy, inv, y)
    uy /= np.bincount(inv)
    return ux, uy


def _prep(rate, dist):
    r = np.log10(np.asarray(rate, dtype=np.float64))
    d = np.asarray(dist, dtype=np.float64)
    d, r = _dedup(d, r)
    return r, d


def bd_rate(rate_anchor, dist_anchor, rate_test, dist_test) -> float:
    """Average bitrate difference (percent) of test vs anchor at equal
    quality. Negative = test saves rate."""
    ra, da = _prep(rate_anchor, dist_anchor)
    rt, dt = _prep(rate_test, dist_test)
    lo = max(da.min(), dt.min())
    hi = min(da.max(), dt.max())
    if hi <= lo:
        raise ValueError("RD curves do not overlap in quality")
    fa = _interp(da, ra)
    ft = _interp(dt, rt)
    xs = np.linspace(lo, hi, 256)
    avg = np.trapezoid(ft(xs) - fa(xs), xs) / (hi - lo)
    return float((10 ** avg - 1) * 100)


def bd_psnr(rate_anchor, dist_anchor, rate_test, dist_test) -> float:
    """Average quality difference (dB) of test vs anchor at equal rate.
    Positive = test is better."""
    ra, da = _prep(rate_anchor, dist_anchor)
    rt, dt = _prep(rate_test, dist_test)
    # swap axes: interpolate dist as a function of log-rate
    ra, da = _dedup(ra, da)
    rt, dt = _dedup(rt, dt)
    fa = _interp(ra, da)
    ft = _interp(rt, dt)
    lo = max(ra.min(), rt.min())
    hi = min(ra.max(), rt.max())
    if hi <= lo:
        raise ValueError("RD curves do not overlap in rate")
    xs = np.linspace(lo, hi, 256)
    return float(np.trapezoid(ft(xs) - fa(xs), xs) / (hi - lo))


def bd_from_results(anchor_json: dict, test_json: dict,
                    metric: str = "psnr"):
    """BD numbers from two results JSONs in the reference schema
    ({'results': {'bpp': [...], 'psnr': [...]}})."""
    a = anchor_json["results"]
    t = test_json["results"]
    return {
        "bd_rate_pct": bd_rate(a["bpp"], a[metric], t["bpp"], t[metric]),
        "bd_psnr_db": bd_psnr(a["bpp"], a[metric], t["bpp"], t[metric]),
    }
