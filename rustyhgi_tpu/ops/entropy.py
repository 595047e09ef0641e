"""Entropy-coding stages for the residual plane.

The reference's only statistical coder is one raw-DEFLATE stream
(reference: src/archive.rs:36-38; README's "several types of statistical
coding" is aspirational — SURVEY.md C8).  This framework provides:

* raw DEFLATE level 9 (zlib) — the .hgi interop path, byte-stream
  compatible with flate2/miniz;
* static order-0 rANS — the native high-throughput stage (C++ via
  rustyhgi_tpu.ops.native, with a bit-identical pure-Python fallback so
  .thgi archives are always readable).

Both produce/consume the same rANS stream layout (see native/rans.cpp):
u16 LE freq[256] normalized to 2**14, u32 LE stream length, rANS bytes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["rans_encode", "rans_decode", "normalized_freqs"]

_SCALE_BITS = 14
_M = 1 << _SCALE_BITS
_L = 1 << 23


def normalized_freqs(counts: np.ndarray) -> np.ndarray:
    """Normalize raw symbol counts to a u16[256] table summing to 2**14.

    Mirrors native/rans.cpp normalize_freqs so host- and device-derived
    (psum'd) histograms produce identical shared coder tables.
    """
    counts = np.asarray(counts, dtype=np.uint64)
    total = int(counts.sum())
    freq = np.zeros(256, dtype=np.int64)
    if total == 0:
        freq[:] = _M // 256
        freq[0] += _M % 256
        return freq.astype(np.uint16)
    present = counts > 0
    scaled = (counts.astype(object) * _M) // total  # exact integer math
    freq[present] = np.maximum(1, np.array(scaled[present], dtype=np.int64))
    drift = _M - int(freq.sum())
    max_sym = int(counts.argmax())
    if freq[max_sym] + drift >= 1:
        freq[max_sym] += drift
    else:
        drift += int(freq[max_sym]) - 1
        freq[max_sym] = 1
        for i in range(256):
            if drift == 0:
                break
            if i == max_sym or freq[i] <= 1:
                continue
            take = min(int(freq[i]) - 1, -drift) if drift < 0 else 0
            freq[i] -= take
            drift += take
    assert int(freq.sum()) == _M
    return freq.astype(np.uint16)


def rans_encode(data: bytes, freqs: Optional[np.ndarray] = None) -> bytes:
    """rANS-compress bytes; prefers the native backend."""
    try:
        from .native import available, native_rans_compress

        if available():
            return native_rans_compress(data, freqs)
    except Exception:
        pass
    return _py_rans_encode(data, freqs)


def rans_decode(data: bytes, raw_size: int) -> bytes:
    """Decompress a rANS stream of known raw size; prefers native."""
    try:
        from .native import available, native_rans_decompress

        if available():
            return native_rans_decompress(data, raw_size)
    except Exception:
        pass
    return _py_rans_decode(data, raw_size)


# -- pure-Python mirror (slow, for portability and cross-validation) -------


_WAYS = 8  # interleave width; must match native/rans.cpp kWays


def _py_rans_encode(data: bytes, freqs: Optional[np.ndarray] = None) -> bytes:
    src = np.frombuffer(data, dtype=np.uint8)
    if freqs is None:
        freq = normalized_freqs(np.bincount(src, minlength=256))
    else:
        freq = np.ascontiguousarray(freqs, dtype=np.uint16)
        if freq.shape != (256,) or int(freq.sum()) != _M:
            raise ValueError("freq table must be u16[256] summing to 2**14")
    cum = np.zeros(257, dtype=np.uint32)
    cum[1:] = np.cumsum(freq)

    out = bytearray()
    x = [_L] * _WAYS
    n = len(src)
    for i in range(n - 1, -1, -1):
        s = int(src[i])
        fs = int(freq[s])
        w = i % _WAYS
        xs = x[w]
        x_max = ((_L >> _SCALE_BITS) << 8) * fs
        while xs >= x_max:
            out.append(xs & 0xFF)
            xs >>= 8
        x[w] = ((xs // fs) << _SCALE_BITS) + (xs % fs) + int(cum[s])
    states = b"".join(x[w].to_bytes(4, "big") for w in range(_WAYS))
    stream = states + bytes(out[::-1])
    header = (
        freq.astype("<u2").tobytes()
        + bytes([_WAYS])
        + len(stream).to_bytes(4, "little")
    )
    return header + stream


def _py_rans_decode(data: bytes, raw_size: int) -> bytes:
    hdr = 512 + 1 + 4
    if len(data) < hdr:
        raise ValueError("rans stream too short")
    freq = np.frombuffer(data[:512], dtype="<u2").astype(np.uint32)
    cum = np.zeros(257, dtype=np.uint32)
    cum[1:] = np.cumsum(freq)
    if int(cum[256]) != _M:
        raise ValueError("invalid rans frequency table")
    if data[512] != _WAYS:
        raise ValueError(f"unsupported rans interleave width {data[512]}")
    stream_len = int.from_bytes(data[513:517], "little")
    stream = data[hdr : hdr + stream_len]
    if len(stream) < 4 * _WAYS:
        raise ValueError("truncated rans stream")

    slot2sym = np.zeros(_M, dtype=np.uint8)
    for s in range(256):
        slot2sym[cum[s] : cum[s + 1]] = s

    x = [
        int.from_bytes(stream[4 * w : 4 * w + 4], "big") for w in range(_WAYS)
    ]
    pos = 4 * _WAYS
    out = bytearray(raw_size)
    mask = _M - 1
    for i in range(raw_size):
        w = i % _WAYS
        xs = x[w]
        slot = xs & mask
        s = int(slot2sym[slot])
        out[i] = s
        xs = int(freq[s]) * (xs >> _SCALE_BITS) + slot - int(cum[s])
        while xs < _L:
            if pos >= len(stream):
                raise ValueError("rans stream underrun")
            xs = (xs << 8) | stream[pos]
            pos += 1
        x[w] = xs
    return bytes(out)
