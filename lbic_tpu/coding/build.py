"""Build the native entropy-coding library on demand (no pip, no cmake).

Compiles rans.cpp + range_coder.cpp into librans.so next to this file
with g++ -O3. Build is lazy, cached, and guarded by atomic replace so
concurrent test workers don't race. Falls back cleanly (callers catch
and use the numpy backend)."""

import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
SRCS = [os.path.join(_DIR, "rans.cpp"),
        os.path.join(_DIR, "range_coder.cpp")]
LIB = os.path.join(_DIR, "librans.so")


def ensure_built(force=False):
    """Return path to librans.so, building it if needed. Raises on failure."""
    if not force and os.path.exists(LIB) and \
            os.path.getmtime(LIB) >= max(os.path.getmtime(s) for s in SRCS):
        return LIB
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp,
             *SRCS],
            check=True, capture_output=True, text=True,
        )
        os.replace(tmp, LIB)  # atomic
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return LIB
