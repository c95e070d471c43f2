"""Build the native rANS library on demand (no pip, no cmake needed).

Compiles rans.cpp to librans.so next to this file with g++ -O3. Build is
lazy, cached, and guarded by a lock file so concurrent test workers don't
race. Falls back cleanly (callers catch and use the numpy backend)."""

import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "rans.cpp")
LIB = os.path.join(_DIR, "librans.so")


def ensure_built(force=False):
    """Return path to librans.so, building it if needed. Raises on failure."""
    if not force and os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, SRC],
            check=True, capture_output=True, text=True,
        )
        os.replace(tmp, LIB)  # atomic
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return LIB
