"""User-facing entropy-coder API.

Mirrors the call pattern the reference uses against compressai.ans
(BufferedRansEncoder.encode_with_indexes/flush, RansDecoder.set_stream/
decode_stream — net.py:153,183-185,213-235) but batched: all arguments are
numpy int32 arrays, decode pulls a whole wavefront-step chunk per call.

Backend: C++ (ctypes, built on demand from rans.cpp) with a pure-Python
fallback producing the identical stream format.
"""

import ctypes
import os

import numpy as np

from lbic_tpu.coding import rans_py

_lib = None
_backend = "python"


def _try_load():
    global _lib, _backend
    if _lib is not None:
        return _lib
    if os.environ.get("LBIC_FORCE_PY_RANS"):
        return None
    try:
        from lbic_tpu.coding.build import ensure_built

        path = ensure_built()
        lib = ctypes.CDLL(path)
        lib.lbic_rans_encode.restype = ctypes.c_int64
        lib.lbic_rans_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.lbic_rans_decoder_new.restype = ctypes.c_void_p
        lib.lbic_rans_decoder_new.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.lbic_rans_decoder_free.argtypes = [ctypes.c_void_p]
        lib.lbic_rans_decode_stream.restype = ctypes.c_int32
        lib.lbic_rans_decode_stream.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.lbic_pmf_to_quantized_cdf.restype = ctypes.c_int32
        lib.lbic_pmf_to_quantized_cdf.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.lbic_rc_encode.restype = ctypes.c_int64
        lib.lbic_rc_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.lbic_rc_decoder_new.restype = ctypes.c_void_p
        lib.lbic_rc_decoder_new.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.lbic_rc_decoder_free.argtypes = [ctypes.c_void_p]
        lib.lbic_rc_decode_stream.restype = ctypes.c_int32
        lib.lbic_rc_decode_stream.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.lbic_rans32_encode_interleaved.restype = ctypes.c_int64
        lib.lbic_rans32_encode_interleaved.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        _lib = lib
        _backend = "cpp"
        return lib
    except Exception:
        return None


def backend_name():
    _try_load()
    return _backend


def _as_i32(a):
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def pmf_to_quantized_cdf_cpp(pmf, precision=16):
    lib = _try_load()
    if lib is None:
        raise RuntimeError("C++ backend unavailable")
    pmf = np.ascontiguousarray(np.asarray(pmf, dtype=np.float64))
    out = np.zeros(len(pmf) + 1, dtype=np.int32)
    rv = lib.lbic_pmf_to_quantized_cdf(
        pmf.ctypes.data, np.int32(len(pmf)), np.int32(precision),
        out.ctypes.data)
    if rv != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed: {rv}")
    return out


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets):
    """One-shot batch encode -> bytes."""
    symbols = _as_i32(symbols).ravel()
    indexes = _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths = _as_i32(cdf_lengths).ravel()
    offsets = _as_i32(offsets).ravel()
    assert symbols.shape == indexes.shape
    lib = _try_load()
    if lib is None:
        return rans_py.encode_with_indexes_py(
            symbols, indexes, cdfs, cdf_lengths, offsets)
    n = symbols.size
    cap = 8 + 8 * n + 1024  # worst case well under 64 bits/symbol
    out = np.zeros(cap, dtype=np.uint8)
    nbytes = lib.lbic_rans_encode(
        symbols.ctypes.data, indexes.ctypes.data, np.int64(n),
        cdfs.ctypes.data, np.int32(cdfs.shape[0]), np.int32(cdfs.shape[1]),
        cdf_lengths.ctypes.data, offsets.ctypes.data,
        out.ctypes.data, np.int64(cap))
    if nbytes < 0:
        raise ValueError(f"rans encode failed: {nbytes}")
    return out[:nbytes].tobytes()


def encode_interleaved(symbols, indexes, valid, M, G, cdfs, cdf_lengths,
                       offsets):
    """rans32 lane-interleaved encode (C++ fast path, numpy fallback).

    symbols/indexes: (steps, Dmax, M) int32; valid: (steps, Dmax) bool.
    Returns the rans32 byte stream (see coding/rans32.py)."""
    symbols = _as_i32(symbols)
    indexes = _as_i32(indexes)
    steps, Dmax, M_ = symbols.shape
    assert M_ == M
    cdfs = _as_i32(cdfs)
    cdf_lengths = _as_i32(cdf_lengths).ravel()
    offsets = _as_i32(offsets).ravel()
    lib = _try_load()
    if lib is None:
        from lbic_tpu.coding import rans32

        return rans32.encode_interleaved(
            symbols, indexes, valid, M, G, cdfs, cdf_lengths, offsets)
    v = np.ascontiguousarray(np.asarray(valid, dtype=np.uint8))
    n_lanes = Dmax * G
    cap = 4 + 4 * n_lanes + 8 * symbols.size + 8 * n_lanes + 4096
    out = np.zeros(cap, dtype=np.uint8)
    nbytes = lib.lbic_rans32_encode_interleaved(
        symbols.ctypes.data, indexes.ctypes.data, v.ctypes.data,
        np.int32(steps), np.int32(Dmax), np.int32(M), np.int32(G),
        cdfs.ctypes.data, np.int32(cdfs.shape[0]), np.int32(cdfs.shape[1]),
        cdf_lengths.ctypes.data, offsets.ctypes.data,
        out.ctypes.data, np.int64(cap))
    if nbytes < 0:
        raise ValueError(f"rans32 encode failed: {nbytes}")
    return out[:nbytes].tobytes()


class BufferedRansEncoder:
    """Buffers (symbols, indexes) chunks; flush() produces one stream."""

    def __init__(self):
        self._symbols = []
        self._indexes = []

    def encode_with_indexes(self, symbols, indexes, *args):
        self._symbols.append(_as_i32(symbols).ravel())
        self._indexes.append(_as_i32(indexes).ravel())

    def flush(self, cdfs, cdf_lengths, offsets):
        symbols = (np.concatenate(self._symbols)
                   if self._symbols else np.zeros(0, np.int32))
        indexes = (np.concatenate(self._indexes)
                   if self._indexes else np.zeros(0, np.int32))
        self._symbols, self._indexes = [], []
        return encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)


def rc_encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets):
    """Range-coder batch encode -> bytes (the alternative backend,
    entropy_layers_cai.py:38-42; same CDF/escape semantics as rANS,
    FIFO symbol order)."""
    symbols = _as_i32(symbols).ravel()
    indexes = _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths = _as_i32(cdf_lengths).ravel()
    offsets = _as_i32(offsets).ravel()
    assert symbols.shape == indexes.shape
    lib = _try_load()
    if lib is None:
        from lbic_tpu.coding import range_coder_py as rcp

        return rcp.encode_with_indexes_py(
            symbols, indexes, cdfs, cdf_lengths, offsets)
    n = symbols.size
    cap = 8 + 8 * n + 1024
    out = np.zeros(cap, dtype=np.uint8)
    nbytes = lib.lbic_rc_encode(
        symbols.ctypes.data, indexes.ctypes.data, np.int64(n),
        cdfs.ctypes.data, np.int32(cdfs.shape[0]), np.int32(cdfs.shape[1]),
        cdf_lengths.ctypes.data, offsets.ctypes.data,
        out.ctypes.data, np.int64(cap))
    if nbytes < 0:
        raise ValueError(f"range-coder encode failed: {nbytes}")
    return out[:nbytes].tobytes()


class BufferedRangeEncoder:
    """Range-coder twin of BufferedRansEncoder (same call pattern)."""

    def __init__(self):
        self._symbols = []
        self._indexes = []

    def encode_with_indexes(self, symbols, indexes, *args):
        self._symbols.append(_as_i32(symbols).ravel())
        self._indexes.append(_as_i32(indexes).ravel())

    def flush(self, cdfs, cdf_lengths, offsets):
        symbols = (np.concatenate(self._symbols)
                   if self._symbols else np.zeros(0, np.int32))
        indexes = (np.concatenate(self._indexes)
                   if self._indexes else np.zeros(0, np.int32))
        self._symbols, self._indexes = [], []
        return rc_encode_with_indexes(symbols, indexes, cdfs, cdf_lengths,
                                      offsets)


class RangeDecoder:
    """Range-coder twin of RansDecoder: set_stream once, then
    decode_stream per chunk."""

    def __init__(self):
        self._cpp = None
        self._py = None
        self._lib = _try_load()

    def set_stream(self, stream: bytes):
        self.close()
        if self._lib is not None:
            buf = np.ascontiguousarray(np.frombuffer(stream,
                                                     dtype=np.uint8))
            self._buf = buf  # keep alive
            self._cpp = self._lib.lbic_rc_decoder_new(
                buf.ctypes.data, np.int64(buf.size))
            if not self._cpp:
                raise ValueError("invalid range-coder stream")
        else:
            from lbic_tpu.coding import range_coder_py as rcp

            self._py = rcp.RangeDecoderPy(stream)

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets):
        indexes = _as_i32(indexes).ravel()
        cdfs = _as_i32(cdfs)
        cdf_lengths = _as_i32(cdf_lengths).ravel()
        offsets = _as_i32(offsets).ravel()
        if self._cpp:
            out = np.zeros(indexes.size, dtype=np.int32)
            rv = self._lib.lbic_rc_decode_stream(
                ctypes.c_void_p(self._cpp), indexes.ctypes.data,
                np.int64(indexes.size),
                cdfs.ctypes.data, np.int32(cdfs.shape[0]),
                np.int32(cdfs.shape[1]),
                cdf_lengths.ctypes.data, offsets.ctypes.data,
                out.ctypes.data)
            if rv != 0:
                raise ValueError(f"range-coder decode failed: {rv}")
            return out
        return self._py.decode_stream(indexes, cdfs, cdf_lengths, offsets)

    def close(self):
        if getattr(self, "_cpp", None):
            self._lib.lbic_rc_decoder_free(ctypes.c_void_p(self._cpp))
            self._cpp = None
        self._py = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


AVAILABLE_ENTROPY_CODERS = ("ans", "rangecoder")


def make_coder(method: str = "ans"):
    """(encoder, decoder) pair by name — the reference's _EntropyCoder
    proxy (entropy_layers_cai.py:18-51): 'ans' (default) or
    'rangecoder'."""
    if method == "ans":
        return BufferedRansEncoder(), RansDecoder()
    if method == "rangecoder":
        return BufferedRangeEncoder(), RangeDecoder()
    raise ValueError(
        f"unknown entropy coder {method!r} "
        f"(available: {', '.join(AVAILABLE_ENTROPY_CODERS)})")


class RansDecoder:
    """Incremental decoder: set_stream once, then decode_stream per chunk."""

    def __init__(self):
        self._cpp = None
        self._py = None
        self._lib = _try_load()

    def set_stream(self, stream: bytes):
        self.close()
        if self._lib is not None:
            buf = np.frombuffer(stream, dtype=np.uint8)
            buf = np.ascontiguousarray(buf)
            self._buf = buf  # keep alive
            self._cpp = self._lib.lbic_rans_decoder_new(
                buf.ctypes.data, np.int64(buf.size))
            if not self._cpp:
                raise ValueError("invalid rANS stream")
        else:
            self._py = rans_py.RansDecoderPy(stream)

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets):
        indexes = _as_i32(indexes).ravel()
        cdfs = _as_i32(cdfs)
        cdf_lengths = _as_i32(cdf_lengths).ravel()
        offsets = _as_i32(offsets).ravel()
        if self._cpp:
            out = np.zeros(indexes.size, dtype=np.int32)
            rv = self._lib.lbic_rans_decode_stream(
                ctypes.c_void_p(self._cpp), indexes.ctypes.data,
                np.int64(indexes.size),
                cdfs.ctypes.data, np.int32(cdfs.shape[0]),
                np.int32(cdfs.shape[1]),
                cdf_lengths.ctypes.data, offsets.ctypes.data,
                out.ctypes.data)
            if rv != 0:
                raise ValueError(f"rans decode failed: {rv}")
            return out
        return self._py.decode_stream(indexes, cdfs, cdf_lengths, offsets)

    def close(self):
        if getattr(self, "_cpp", None):
            self._lib.lbic_rans_decoder_free(ctypes.c_void_p(self._cpp))
            self._cpp = None
        self._py = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
