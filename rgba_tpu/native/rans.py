"""ctypes bindings for the native rANS coder (librans.so).

Device/host split (SURVEY §3.4): the TPU produces int32 ``symbols`` and
``indexes`` tensors in one jitted pass; this module turns them into bytes
on the CPU and back.  The streaming decoder handle supports the
slice-interleaved decode of the channel-AR model.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[Exception] = None


def _get_lib() -> ctypes.CDLL:
    global _lib, _load_error
    if _lib is not None:
        return _lib
    if _load_error is not None:
        raise RuntimeError(f"native rans unavailable: {_load_error}")
    try:
        from .build import build
        path = build()
        lib = ctypes.CDLL(path)
    except Exception as e:  # noqa: BLE001
        _load_error = e
        raise RuntimeError(f"native rans unavailable: {e}") from e

    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.rans_pmf_to_quantized_cdf.restype = ctypes.c_int
    lib.rans_pmf_to_quantized_cdf.argtypes = [f32p, ctypes.c_int,
                                              ctypes.c_int, u32p]
    lib.rans_encode_with_indexes.restype = ctypes.c_int64
    lib.rans_encode_with_indexes.argtypes = [
        i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int, ctypes.c_int,
        i32p, i32p, u8p, ctypes.c_int64]
    lib.rans_decoder_new.restype = ctypes.c_void_p
    lib.rans_decoder_new.argtypes = [u8p, ctypes.c_int64]
    lib.rans_decoder_free.restype = None
    lib.rans_decoder_free.argtypes = [ctypes.c_void_p]
    lib.rans_decode_stream.restype = ctypes.c_int
    lib.rans_decode_stream.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, i32p, ctypes.c_int,
        ctypes.c_int, i32p, i32p, i32p]
    lib.rans_decode_with_indexes.restype = ctypes.c_int
    lib.rans_decode_with_indexes.argtypes = [
        u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int,
        ctypes.c_int, i32p, i32p, i32p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.rans32_encode_lanes.restype = ctypes.c_int64
    lib.rans32_encode_lanes.argtypes = [
        i32p, i32p, u8p, i64p, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, i32p, ctypes.c_int, i32p, i32p, u16p,
        ctypes.c_int64, i32p]
    lib.rans32_decode_lanes.restype = ctypes.c_int
    lib.rans32_decode_lanes.argtypes = [
        u16p, i32p, i32p, u8p, i64p, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, i32p, ctypes.c_int, i32p, i32p, i32p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _get_lib()
        return True
    except RuntimeError:
        return False


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    lib = _get_lib()
    pmf = np.ascontiguousarray(pmf, dtype=np.float32)
    out = np.zeros(pmf.shape[0] + 1, dtype=np.uint32)
    rc = lib.rans_pmf_to_quantized_cdf(
        _ptr(pmf, ctypes.c_float), pmf.shape[0], precision,
        _ptr(out, ctypes.c_uint32))
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed: {rc}")
    return out


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    lib = _get_lib()
    symbols = _i32(symbols).ravel()
    indexes = _i32(indexes).ravel()
    cdfs = _i32(cdfs)
    cdf_lengths = _i32(cdf_lengths)
    offsets = _i32(offsets)
    assert symbols.shape == indexes.shape
    cap = max(4096, symbols.size * 8 + 64)
    out = np.zeros(cap, dtype=np.uint8)
    n = lib.rans_encode_with_indexes(
        _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32),
        symbols.size, _ptr(cdfs, ctypes.c_int32), cdfs.shape[0],
        cdfs.shape[1], _ptr(cdf_lengths, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int32), _ptr(out, ctypes.c_uint8), cap)
    if n < 0:
        raise RuntimeError("rans encode buffer overflow")
    return out[:n].tobytes()


def decode_with_indexes(data: bytes, indexes, cdfs, cdf_lengths,
                        offsets) -> np.ndarray:
    lib = _get_lib()
    indexes = _i32(indexes)
    shape = indexes.shape
    flat = indexes.ravel()
    cdfs = _i32(cdfs)
    cdf_lengths = _i32(cdf_lengths)
    offsets = _i32(offsets)
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros(flat.size, dtype=np.int32)
    rc = lib.rans_decode_with_indexes(
        _ptr(buf, ctypes.c_uint8), buf.size, _ptr(flat, ctypes.c_int32),
        flat.size, _ptr(cdfs, ctypes.c_int32), cdfs.shape[0], cdfs.shape[1],
        _ptr(cdf_lengths, ctypes.c_int32), _ptr(offsets, ctypes.c_int32),
        _ptr(out, ctypes.c_int32))
    if rc != 0:
        raise RuntimeError(f"rans decode failed: {rc}")
    return out.reshape(shape)


def encode_lanes(symbols, indexes, seg_ends, lanes: int, cdfs, cdf_lengths,
                 offsets, alive=None) -> tuple:
    """Encode one flat symbol sequence into `lanes` interleaved 32-bit
    rANS lane streams (the device-decodable format — see
    rgba_tpu/entropy/device_rans.py for the lane/segment contract).

    Returns (words, lane_nwords): uint16 word array (all lanes
    concatenated, each in decode order) and per-lane word counts."""
    lib = _get_lib()
    symbols = _i32(symbols).ravel()
    indexes = _i32(indexes).ravel()
    seg_ends = np.ascontiguousarray(seg_ends, dtype=np.int64).ravel()
    cdfs = _i32(cdfs)
    cdf_lengths = _i32(cdf_lengths)
    offsets = _i32(offsets)
    assert symbols.shape == indexes.shape
    alive_p = None
    if alive is not None:
        alive = np.ascontiguousarray(alive, dtype=np.uint8).ravel()
        assert alive.shape == symbols.shape
        alive_p = _ptr(alive, ctypes.c_uint8)
    cap = symbols.size * 3 + 4 * lanes + 64
    out = np.zeros(cap, dtype=np.uint16)
    lane_nwords = np.zeros(lanes, dtype=np.int32)
    n = lib.rans32_encode_lanes(
        _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32),
        alive_p, _ptr(seg_ends, ctypes.c_int64), seg_ends.size,
        symbols.size, lanes, _ptr(cdfs, ctypes.c_int32), cdfs.shape[1],
        _ptr(cdf_lengths, ctypes.c_int32), _ptr(offsets, ctypes.c_int32),
        _ptr(out, ctypes.c_uint16), cap, _ptr(lane_nwords, ctypes.c_int32))
    if n == -1:
        raise RuntimeError("rans32 encode buffer overflow")
    if n < 0:
        raise ValueError(f"rans32_encode_lanes failed: {n}")
    return out[:n].copy(), lane_nwords


def decode_lanes(words, lane_nwords, indexes, seg_ends, cdfs, cdf_lengths,
                 offsets, alive=None) -> np.ndarray:
    """Host-side decode of the lane format (independent C++ twin of the
    device decoder; tests pin all three ends against each other)."""
    lib = _get_lib()
    words = np.ascontiguousarray(words, dtype=np.uint16).ravel()
    lane_nwords = _i32(lane_nwords).ravel()
    indexes = _i32(indexes)
    shape = indexes.shape
    flat = indexes.ravel()
    seg_ends = np.ascontiguousarray(seg_ends, dtype=np.int64).ravel()
    cdfs = _i32(cdfs)
    alive_p = None
    if alive is not None:
        alive = np.ascontiguousarray(alive, dtype=np.uint8).ravel()
        assert alive.shape == flat.shape
        alive_p = _ptr(alive, ctypes.c_uint8)
    out = np.zeros(flat.size, dtype=np.int32)
    rc = lib.rans32_decode_lanes(
        _ptr(words, ctypes.c_uint16), _ptr(lane_nwords, ctypes.c_int32),
        _ptr(flat, ctypes.c_int32), alive_p,
        _ptr(seg_ends, ctypes.c_int64), seg_ends.size, flat.size,
        lane_nwords.size, _ptr(cdfs, ctypes.c_int32), cdfs.shape[1],
        _ptr(_i32(cdf_lengths), ctypes.c_int32),
        _ptr(_i32(offsets), ctypes.c_int32), _ptr(out, ctypes.c_int32))
    if rc != 0:
        raise RuntimeError(f"rans32_decode_lanes failed: {rc}")
    return out.reshape(shape)


class RansDecoder:
    """Streaming decoder over one byte stream (decode_stream per slice)."""

    def __init__(self, data: bytes):
        self._lib = _get_lib()
        self._buf = np.frombuffer(data, dtype=np.uint8)
        self._handle = self._lib.rans_decoder_new(
            _ptr(self._buf, ctypes.c_uint8), self._buf.size)

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        indexes = _i32(indexes)
        shape = indexes.shape
        flat = indexes.ravel()
        cdfs = _i32(cdfs)
        out = np.zeros(flat.size, dtype=np.int32)
        rc = self._lib.rans_decode_stream(
            self._handle, _ptr(flat, ctypes.c_int32), flat.size,
            _ptr(cdfs, ctypes.c_int32), cdfs.shape[0], cdfs.shape[1],
            _ptr(_i32(cdf_lengths), ctypes.c_int32),
            _ptr(_i32(offsets), ctypes.c_int32), _ptr(out, ctypes.c_int32))
        if rc != 0:
            raise RuntimeError(f"rans decode_stream failed: {rc}")
        return out.reshape(shape)

    def close(self):
        if self._handle:
            self._lib.rans_decoder_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
