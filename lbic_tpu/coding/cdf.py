"""Float PMF -> 16-bit quantized CDF.

Numpy reference implementation of the conversion the reference gets from
compressai._CXX.pmf_to_quantized_cdf (entropy_layers_cai.py:13,61-64); the
C++ build (rans.cpp) exposes the same algorithm and tests cross-check them.

Algorithm: scale the PMF to integer frequencies summing to 2^precision, then
repair zero-frequency symbols by stealing counts from the symbol with the
largest frequency (keeping every symbol codable, as compressai does).
"""

import numpy as np


def pmf_to_quantized_cdf_np(pmf, precision=16):
    pmf = np.asarray(pmf, dtype=np.float64)
    if np.any(pmf < 0) or not np.all(np.isfinite(pmf)):
        raise ValueError("pmf must be finite and non-negative")
    n = len(pmf)
    total = 1 << precision
    freqs = np.round(pmf * total).astype(np.int64)
    s = int(freqs.sum())
    if s == 0:
        freqs = np.ones(n, dtype=np.int64)
        s = n
    # normalize to exactly `total`
    freqs = (freqs.astype(np.uint64) * np.uint64(total) // np.uint64(s)).astype(np.int64)
    cdf = np.zeros(n + 1, dtype=np.int64)
    cdf[1:] = np.cumsum(freqs)
    cdf[-1] = total
    # repair zero-width intervals by stealing from the widest
    for i in range(n):
        while cdf[i + 1] <= cdf[i]:
            widths = np.diff(cdf)
            j = int(np.argmax(widths))
            if widths[j] <= 1:
                raise ValueError("cannot repair cdf: too many symbols for precision")
            if j >= i + 1:
                # shift boundaries (i+1..j) up by 1
                cdf[i + 1 : j + 1] += 1
            else:
                # shift boundaries (j+1..i) down by 1
                cdf[j + 1 : i + 1] -= 1
    assert cdf[0] == 0 and cdf[-1] == total
    assert np.all(np.diff(cdf) > 0)
    return cdf.astype(np.int32)
