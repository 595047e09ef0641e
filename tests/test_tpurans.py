"""Lane-parallel device rANS (ops.tpurans): roundtrip, size, hardening.

The coder has no external golden model — its contract is (1) exact
roundtrip for every input, (2) payloads within a whisker of the host
rANS coder on real residuals (VERDICT round-2 #4: <= 1.2x), and
(3) ValueError (never a crash or over-allocation) on malformed input.
"""

import numpy as np
import pytest

from rustyhgi_tpu.ops.tpurans import (
    MAX_SYMBOLS,
    decode_bytes,
    encode_bytes,
    lanes_for,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0xA5)


def _roundtrip(data: bytes):
    enc = encode_bytes(data)
    out = decode_bytes(enc, expected_n=len(data))
    assert out.tobytes() == data
    return enc


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 511, 512, 513, 65536])
def test_roundtrip_sizes(rng, n):
    _roundtrip(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    _roundtrip((rng.geometric(0.3, n) % 256).astype(np.uint8).tobytes())


def test_roundtrip_degenerate(rng):
    _roundtrip(bytes(10000))  # all zeros
    _roundtrip(bytes([255]) * 3000)  # single non-zero symbol
    _roundtrip(bytes([0, 255] * 500))  # two symbols
    _roundtrip(bytes(range(256)) * 4)  # uniform, all symbols present
    _roundtrip(bytes([7]))  # single byte


def test_empty_stream():
    enc = encode_bytes(b"")
    assert decode_bytes(enc, expected_n=0).size == 0


def test_lane_choice_monotone():
    assert lanes_for(1) == 128
    assert lanes_for(10**9) == 8192
    prev = 0
    for n in (1, 1000, 100_000, 1_000_000, MAX_SYMBOLS):
        l = lanes_for(n)
        assert l >= prev and l & (l - 1) == 0
        prev = l


def test_size_within_1p2x_of_host_rans(rng):
    """The VERDICT #4 acceptance bound, on residual-shaped data."""
    from rustyhgi_tpu.ops.entropy import rans_encode

    for p in (0.05, 0.3, 0.8):
        data = (rng.geometric(p, 300_000) % 256).astype(np.uint8).tobytes()
        tpu = len(encode_bytes(data))
        host = len(rans_encode(data))
        assert tpu <= 1.2 * host, (p, tpu, host)


def test_size_on_real_residuals(rng):
    """Actual codec residuals (the production payload shape)."""
    from rustyhgi_tpu.models.codec import HGICodec
    from rustyhgi_tpu.ops.entropy import rans_encode

    x = np.arange(192, dtype=np.int64)
    y = np.arange(144, dtype=np.int64)
    img = ((y[:, None] * x[None, :]) & 0xFF).astype(np.uint8)
    for quant in ("lossless", "medium"):
        grid = np.asarray(HGICodec(4, quant).encode_plane(img)[0])
        raw = grid.ravel().tobytes()
        assert _roundtrip(raw) is not None
        tpu = len(encode_bytes(raw))
        host = len(rans_encode(raw))
        assert tpu <= 1.2 * host, (quant, tpu, host)


def test_declared_size_mismatch_rejected(rng):
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    enc = bytearray(encode_bytes(data))
    enc[0:4] = (1 << 30).to_bytes(4, "little")  # hostile embedded n
    with pytest.raises(ValueError, match="does not match declared"):
        decode_bytes(bytes(enc), expected_n=5000)


def test_malformed_streams_rejected(rng):
    data = (rng.geometric(0.2, 20_000) % 256).astype(np.uint8).tobytes()
    enc = encode_bytes(data)

    with pytest.raises(ValueError):
        decode_bytes(enc[:6], expected_n=len(data))  # truncated header
    with pytest.raises(ValueError):
        decode_bytes(enc[:600], expected_n=len(data))  # truncated counts
    with pytest.raises(ValueError):
        decode_bytes(enc[:-10], expected_n=len(data))  # truncated body

    bad = bytearray(enc)
    bad[4:8] = (77).to_bytes(4, "little")  # non-pow2 lane count
    with pytest.raises(ValueError, match="lane count"):
        decode_bytes(bytes(bad), expected_n=len(data))

    bad = bytearray(enc)
    bad[8:10] = (0xFFFF).to_bytes(2, "little")  # breaks table sum
    with pytest.raises(ValueError, match="frequency table"):
        decode_bytes(bytes(bad), expected_n=len(data))


def test_corruption_fuzz_never_crashes(rng):
    data = (rng.geometric(0.2, 30_000) % 256).astype(np.uint8).tobytes()
    enc = encode_bytes(data)
    for _ in range(60):
        b = bytearray(enc)
        cut = int(rng.integers(1, len(b)))
        b = b[:cut]
        if len(b) > 8:
            b[int(rng.integers(0, len(b)))] ^= 0xFF
        try:
            out = decode_bytes(bytes(b), expected_n=len(data))
            # A surviving decode must at least be size-correct.
            assert out.size == len(data)
        except ValueError:
            pass


def test_write_fast_emits_rans_tpu_and_reads_back(rng):
    from rustyhgi_tpu.models.codec import HGICodec
    from rustyhgi_tpu.utils.container import _CODEC_RANS_TPU, read_thgi

    img = rng.integers(0, 256, (61, 83), dtype=np.uint8)
    codec = HGICodec(3, "medium")
    blob = codec.write_fast(img)
    arch = read_thgi(blob)
    expect = np.asarray(codec.encode_plane(img)[0])
    assert np.array_equal(arch.grid, expect)
    # The payload really is the device coder (not a silent fallback).
    from rustyhgi_tpu.utils.container import _METADATA
    import struct

    off = 4 + _METADATA.size
    _, tag = struct.unpack_from("<BB", blob, off)
    assert tag == _CODEC_RANS_TPU


def test_write_fast_batch_matches_per_plane(rng):
    from rustyhgi_tpu.models.codec import HGICodec
    from rustyhgi_tpu.utils.container import read_thgi

    imgs = rng.integers(0, 256, (3, 61, 83), dtype=np.uint8)
    codec = HGICodec(3, "medium")
    blobs = codec.write_fast_batch(imgs)
    assert len(blobs) == 3
    for i, blob in enumerate(blobs):
        # Byte-identical to the single-plane fast path...
        assert blob == codec.write_fast(imgs[i])
        # ...and decodes to the right grid.
        arch = read_thgi(blob)
        expect = np.asarray(codec.encode_plane(imgs[i])[0])
        assert np.array_equal(arch.grid, expect)
    assert codec.write_fast_batch(imgs[:0]) == []


def test_write_fast_batch_tail_fetch_on_busy_after_quiet(rng):
    """An under-estimated prefix must trigger the tail fetch, not corrupt.

    write_fast_batch sizes its single prefix transfer from a cached
    per-shape row estimate.  A quiet (highly compressible) image drives
    the estimate down; a busy (incompressible) image afterwards needs
    more stream rows than the guess — the path that fetches the missing
    tail in a second transfer (models/codec.py write_fast_batch) must
    produce bytes identical to a fresh codec's (whose first-call guess
    covers the whole buffer).  VERDICT r4 #7.
    """
    import jax.numpy as jnp

    from rustyhgi_tpu.models.codec import HGICodec
    from rustyhgi_tpu.ops import tpurans
    from rustyhgi_tpu.utils.container import read_thgi

    h, w = 200, 256  # big enough that busy rows exceed the 32-row bucket
    quiet = np.zeros((h, w), np.uint8)
    busy = rng.integers(0, 256, (h, w), dtype=np.uint8)
    codec = HGICodec(3, "lossless")
    codec.write_fast(quiet)
    codec.write_fast(quiet)  # settle the estimate on the quiet content
    n = h * w
    L = tpurans.lanes_for(n)
    T = -(-n // L)
    est = codec._encode_cache[("fast_rows", h, w)]
    guess = min(T, -(-est // 32) * 32)
    # Precondition: the busy image really needs more rows than the guess
    # (otherwise this test would silently not exercise the tail path).
    grid = np.asarray(codec.encode_plane(busy)[0]).reshape(-1)
    _, counts, _, _ = tpurans.encode_device(jnp.asarray(grid))
    rows = min(T, -(-int(np.asarray(counts).sum()) // L))
    assert rows > guess, (rows, guess)
    blob = codec.write_fast(busy)
    fresh = HGICodec(3, "lossless").write_fast(busy)
    assert blob == fresh
    assert np.array_equal(read_thgi(blob).grid, grid.reshape(h, w))
    # The estimator must have learned the busier content (monotonic up).
    assert codec._encode_cache[("fast_rows", h, w)] > est


def test_write_fast_batch_mixed_content_byte_identity(rng):
    """Every blob of a mixed batch == per-plane write_fast, byte for byte.

    Mixed content maximizes per-plane row-count disagreement inside one
    batch (shared guess, different tails) — the guess must never leak
    into the emitted bytes.  VERDICT r4 #7.
    """
    from rustyhgi_tpu.models.codec import HGICodec

    h, w = 48, 56
    quiet = np.zeros((h, w), np.uint8)
    grad = ((np.arange(h)[:, None] * np.arange(w)[None, :]) & 0xFF).astype(
        np.uint8
    )
    busy = rng.integers(0, 256, (h, w), dtype=np.uint8)
    batch = np.stack([quiet, busy, grad, busy])
    codec = HGICodec(4, "medium")
    codec.write_fast_batch(batch)  # first call: estimate cold
    blobs = codec.write_fast_batch(batch)  # second: estimated guess live
    for i, blob in enumerate(blobs):
        assert blob == HGICodec(4, "medium").write_fast(batch[i]), i


def test_write_fast_batch_recompile_bound(rng):
    """Per shape, the fused program recompiles at most 2 + growth times.

    The 32-row guess bucket is baked into the jit key; the claimed bound
    (models/codec.py) is: first call re-buckets once (no estimate), then
    the key is stable until a strictly busier batch raises the bucket.
    VERDICT r4 #7.
    """
    from rustyhgi_tpu.models.codec import HGICodec

    h, w = 40, 48
    quiet = np.zeros((4, h, w), np.uint8)
    busy = rng.integers(0, 256, (4, h, w), dtype=np.uint8)
    codec = HGICodec(3, "lossless")

    def fastb_keys():
        return {
            k for k in codec._encode_cache if isinstance(k, tuple)
            and k and k[0] == "fastb"
        }

    for _ in range(4):
        codec.write_fast_batch(quiet)
    assert len(fastb_keys()) <= 2  # cold key + estimated key
    before = fastb_keys()
    for _ in range(3):
        codec.write_fast_batch(busy)  # busier: bucket may grow ONCE
    assert len(fastb_keys() - before) <= 1
    after = fastb_keys()
    for _ in range(3):
        codec.write_fast_batch(quiet)  # estimate is sticky-high: no churn
        codec.write_fast_batch(busy)
    assert fastb_keys() == after


def test_write_fast_preview_falls_back_to_full_decode(rng):
    from rustyhgi_tpu.models.codec import HGICodec
    from rustyhgi_tpu.utils.container import read_preview

    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    codec = HGICodec(3, "lossless")
    blob = codec.write_fast(img)
    meta, anchors, subbands, upto = read_preview(blob, 1)
    assert upto == 1
    assert len(subbands) == 1


# -- native/Python decoder parity (native/tpu_rans.cpp) ----------------------


def _force_python(monkeypatch):
    import rustyhgi_tpu.ops.native as nat

    monkeypatch.setattr(nat, "available", lambda: False)


def test_native_and_python_decoders_bit_identical(rng, monkeypatch):
    from rustyhgi_tpu.ops import native as nat

    if not nat.available():
        pytest.skip("native library unavailable")
    for p in (0.05, 0.4):
        data = (rng.geometric(p, 150_000) % 256).astype(np.uint8).tobytes()
        enc = encode_bytes(data)
        out_native = decode_bytes(enc, expected_n=len(data))
        _force_python(monkeypatch)
        out_py = decode_bytes(enc, expected_n=len(data))
        monkeypatch.undo()
        assert np.array_equal(out_native, out_py)
        assert out_native.tobytes() == data


def test_native_and_python_reject_identically(rng, monkeypatch):
    """Both backends must agree on accept/reject for corrupted inputs."""
    from rustyhgi_tpu.ops import native as nat

    if not nat.available():
        pytest.skip("native library unavailable")
    data = (rng.geometric(0.2, 40_000) % 256).astype(np.uint8).tobytes()
    enc = encode_bytes(data)
    for _ in range(80):
        b = bytearray(enc)
        cut = int(rng.integers(1, len(b)))
        b = b[:cut]
        if len(b) > 8:
            b[int(rng.integers(0, len(b)))] ^= 0xFF
        blob = bytes(b)

        def run():
            try:
                return True, decode_bytes(blob, expected_n=len(data))
            except ValueError:
                return False, None

        ok_native, out_native = run()
        _force_python(monkeypatch)
        ok_py, out_py = run()
        monkeypatch.undo()
        assert ok_native == ok_py
        if ok_native:
            assert np.array_equal(out_native, out_py)
