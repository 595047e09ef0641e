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


# -- chunk-parallel (ctx_mt) framing ----------------------------------------


def test_ctx_mt_roundtrip_all_k_and_spec_chunks():
    """MT framing round-trips for every chunk count; each chunk is a
    standard single stream (decodable by the PYTHON spec coder on the
    recomputed sub-piece table) — the MT layer adds framing only."""
    import struct

    from rustyhgi_tpu.ops.ctxcoder import (
        ctx_decode_mt,
        ctx_encode_mt,
        split_pieces,
    )

    rng = np.random.default_rng(11)
    pieces = [(9, 13, 0), (8, 12, 1), (8, 12, 1), (16, 24, 2), (32, 48, 3)]
    total = sum(h * w for h, w, _ in pieces)
    payload = (rng.integers(0, 5, total, dtype=np.uint8)).tobytes()
    for k in (1, 2, 3, 8):
        blob = ctx_encode_mt(payload, pieces, 5, k=k)
        assert ctx_decode_mt(blob, pieces, 5)[:total] == payload
        # cross-check chunk 0 against the Python spec decoder
        lens = struct.unpack_from(f"<{k}I", blob, 1)
        head = 1 + 4 * k
        lo, sub = split_pieces(pieces, k)[0]
        sz = sum(h * w for h, w, _ in sub)
        assert (
            py_ctx_decode(blob[head : head + lens[0]], sub, 5)[:sz]
            == payload[lo : lo + sz]
        )


def test_ctx_mt_split_properties():
    from rustyhgi_tpu.ops.ctxcoder import split_pieces

    pieces = [(5, 7, 0), (20, 31, 1), (20, 31, 1), (40, 62, 2)]
    total = sum(h * w for h, w, _ in pieces)
    for k in (1, 2, 3, 5, 8):
        spans = split_pieces(pieces, k)
        assert len(spans) == k and spans[0][0] == 0
        sizes = [sum(h * w for h, w, _ in sub) for _, sub in spans]
        assert sum(sizes) == total
        # anchors piece (group 0) never split
        n_anchor = sum(
            1 for _, sub in spans for h, w, g in sub if g == 0 and h * w > 0
        )
        assert n_anchor == 1
        # offsets are consistent with sizes (contiguity)
        offs = [lo for lo, _ in spans]
        for j in range(k):
            assert offs[j] == sum(sizes[:j])


def test_ctx_mt_malformed_streams():
    from rustyhgi_tpu.ops.ctxcoder import ctx_decode_mt, ctx_encode_mt

    rng = np.random.default_rng(3)
    pieces = [(4, 8, 1), (4, 8, 1)]
    payload = rng.integers(0, 3, 64, dtype=np.uint8).tobytes()
    blob = ctx_encode_mt(payload, pieces, 5, k=2)
    for bad in (b"", blob[:1], blob[:5], b"\x00" + blob[1:],
                b"\xff" + blob[1:], blob[: len(blob) // 2]):
        try:
            ctx_decode_mt(bad, pieces, 5)
        except ValueError:
            pass  # precise rejection is the contract
        # (a short-but-parseable stream may decode garbage bytes — the
        # container layer's raw_size check rejects it upstream)


def test_container_ctx_mt_roundtrip():
    """write_thgi picks the MT framing for large subband payloads and
    read_thgi/read_thgi_preview decode it."""
    from rustyhgi_tpu.ops import ctxcoder
    from rustyhgi_tpu.utils.container import (
        _CODEC_CTX_MT,
        Archive,
        Interpolation,
        Metadata,
        read_preview,
        read_thgi,
        write_thgi,
    )
    from rustyhgi_tpu.ops.quantizers import QuantizationLevel

    rng = np.random.default_rng(5)
    h, w = 96, 128
    grid = (rng.integers(0, 3, (h, w)) % 256).astype(np.uint8)
    meta = Metadata(QuantizationLevel.LOSSLESS, Interpolation.CROSSED, w, h, 3)
    a = Archive(meta, grid)
    blob = write_thgi(a, layouts=("subband",), codecs=("ctx_mt",))
    assert blob[len(blob) - len(blob) + 4 + _METADATA.size + 1] in (
        _CODEC_CTX_MT,
    )  # codec tag byte
    b = read_thgi(blob)
    assert np.array_equal(b.grid, grid)
    meta2, anchors, subs, upto = read_preview(blob, 1)
    assert upto == 1 and anchors.size > 0
