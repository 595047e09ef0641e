"""Context-adaptive range coder: spec/native cross-validation + container.

The pure-Python implementation in ops/ctxcoder.py is the specification;
the C++ twin (native/ctx_coder.cpp) must produce byte-identical streams
in both directions, and .thgi archives that pick the ctx codec must
roundtrip regardless of which backend wrote them.
"""

import numpy as np
import pytest

from rustyhgi_tpu.ops.ctxcoder import (
    ctx_decode,
    ctx_encode,
    piece_table,
    py_ctx_decode,
    py_ctx_encode,
)
from rustyhgi_tpu.utils.container import (
    _CODEC_CTX,
    _LAYOUT_SUBBAND,
    _METADATA,
    read_thgi,
    write_thgi,
)

TABLES = [
    [(5, 7, 0), (3, 4, 1), (3, 4, 1), (3, 4, 1), (6, 8, 2), (6, 8, 2), (6, 8, 2)],
    [(1, 1, 0)],
    [(2, 3, 0), (1, 1, 4), (1, 1, 4), (1, 1, 4)],
    [(9, 65, 0), (5, 33, 1), (5, 33, 1), (5, 33, 1)],
]


def _payloads(n, rng):
    yield rng.integers(0, 256, n, dtype=np.uint8).tobytes()  # incompressible
    yield bytes(n)  # degenerate
    # near-zero mod-256 residuals (the realistic case)
    vals = (256 - rng.integers(0, 4, n).astype(np.int64)) % 256
    yield vals.astype(np.uint8).tobytes()


@pytest.mark.parametrize("pieces", TABLES)
def test_python_roundtrip(pieces):
    rng = np.random.default_rng(7)
    n = sum(h * w for h, w, _ in pieces)
    for payload in _payloads(n, rng):
        enc = py_ctx_encode(payload, pieces)
        assert py_ctx_decode(enc, pieces) == payload


@pytest.mark.parametrize("pieces", TABLES)
def test_native_bit_identical(pieces):
    native = pytest.importorskip("rustyhgi_tpu.ops.native")
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(8)
    n = sum(h * w for h, w, _ in pieces)
    for payload in _payloads(n, rng):
        a = py_ctx_encode(payload, pieces)
        b = native.native_ctx_compress(payload, pieces)
        assert a == b  # identical streams both ways
        assert native.native_ctx_decompress(a, pieces) == payload
        assert py_ctx_decode(b, pieces) == payload


def test_piece_table_groups():
    rows = piece_table((4, 5), [(8, 10), (16, 20), (32, 40), (64, 80), (128, 160)])
    assert rows[0] == (4, 5, 0)
    assert rows[1:4] == [(8, 10, 1)] * 3
    # deep levels clamp to the last group
    assert rows[13:16] == [(128, 160, 4)] * 3
    assert len(rows) == 1 + 3 * 5


def _smooth_image(h, w):
    # photo-like: smooth gradient plus mild seeded noise — LZ finds no
    # matches, so the context coder's magnitude modeling wins
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 2 + y * 3) // 4
    noise = np.random.default_rng(3).integers(0, 7, (h, w))
    return ((base + noise) % 256).astype(np.uint8)


@pytest.mark.parametrize("quant", ["lossless", "medium"])
def test_container_ctx_roundtrip(quant):
    from rustyhgi_tpu.models.codec import HGICodec

    img = _smooth_image(64, 96)
    codec = HGICodec(3, quant)
    archive = codec.encode(img)
    # force the ctx codec so this test genuinely drives the ctx read path
    # (on tiny images DEFLATE can legitimately win the size race)
    blob = write_thgi(archive, layouts=("subband",), codecs=("ctx",))
    layout, tag = blob[4 + _METADATA.size], blob[5 + _METADATA.size]
    assert (layout, tag) == (_LAYOUT_SUBBAND, _CODEC_CTX)
    back = read_thgi(blob)
    assert np.array_equal(back.grid, archive.grid)
    assert back.metadata == archive.metadata


def test_container_ctx_python_fallback(monkeypatch):
    """Archives decode with the pure-Python path when native is absent."""
    from rustyhgi_tpu.models.codec import HGICodec
    from rustyhgi_tpu.ops import native

    img = _smooth_image(32, 48)
    archive = HGICodec(2, "lossless").encode(img)
    blob = write_thgi(archive, layouts=("subband",), codecs=("ctx",))
    monkeypatch.setattr(native, "available", lambda: False)
    back = read_thgi(blob)
    assert np.array_equal(back.grid, archive.grid)


def test_ctx_encode_decode_helpers_agree():
    rng = np.random.default_rng(9)
    pieces = TABLES[0]
    n = sum(h * w for h, w, _ in pieces)
    payload = rng.integers(0, 6, n, dtype=np.uint8).tobytes()
    enc = ctx_encode(payload, pieces)
    assert ctx_decode(enc, pieces) == payload
    assert py_ctx_decode(enc, pieces) == payload


def test_malformed_streams_no_crash_and_backend_consistent():
    """Garbage/truncated ctx streams must decode (to deterministic garbage,
    like the reference's checksum-free container) without crashing, and the
    Python and native decoders must agree byte-for-byte even then."""
    native = pytest.importorskip("rustyhgi_tpu.ops.native")
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    pieces = [(4, 6, 0), (2, 3, 1), (2, 3, 1), (2, 3, 1)]
    n = sum(h * w for h, w, _ in pieces)
    for _ in range(25):
        blob = rng.integers(0, 256, int(rng.integers(0, 60)), dtype=np.uint8)
        blob = blob.tobytes()
        a = py_ctx_decode(blob, pieces)
        b = native.native_ctx_decompress(blob, pieces)
        assert len(a) == n and a == b
    payload = rng.integers(0, 5, n, dtype=np.uint8).tobytes()
    enc = py_ctx_encode(payload, pieces)
    for cut in (0, 1, len(enc) // 2, len(enc) - 1):
        assert py_ctx_decode(enc[:cut], pieces) == native.native_ctx_decompress(
            enc[:cut], pieces
        )
