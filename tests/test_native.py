"""Native C++ backend tests: scalar codec vs oracle, rANS roundtrips."""

import numpy as np
import pytest

from rustyhgi_tpu.oracle import oracle_decode, oracle_encode
from rustyhgi_tpu.ops import entropy
from rustyhgi_tpu.ops.native import (
    available,
    native_decode,
    native_encode,
    native_rans_compress,
    native_rans_decompress,
)
from rustyhgi_tpu.ops.quantizers import QuantizationLevel

needs_native = pytest.mark.skipif(
    not available(), reason="native library not built"
)


@needs_native
@pytest.mark.parametrize("quant", list(QuantizationLevel))
@pytest.mark.parametrize("shape", [(8, 8), (17, 13), (64, 48)])
def test_native_codec_matches_oracle(rng, quant, shape):
    image = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for levels in (1, 3, 4):
        want = oracle_encode(image, levels, quant)
        got = native_encode(image, levels, quant)
        assert np.array_equal(got, want), (shape, levels, quant)
        assert np.array_equal(
            native_decode(want, levels), oracle_decode(want, levels)
        )


@needs_native
def test_native_codec_lena(lena):
    grid = native_encode(lena, 4, QuantizationLevel.LOSSLESS)
    assert np.array_equal(native_decode(grid, 4), lena)


@needs_native
def test_native_rans_roundtrip(rng):
    for n in (0, 1, 7, 1000, 65536):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        blob = native_rans_compress(data)
        assert native_rans_decompress(blob, n) == data


@needs_native
def test_native_rans_skewed_and_constant(rng):
    # constant plane (single-symbol distribution) and heavy skew
    for data in (b"\x00" * 10000, bytes(rng.choice([0, 0, 0, 0, 1, 2], 5000))):
        blob = native_rans_compress(data)
        assert native_rans_decompress(blob, len(data)) == data
        assert len(blob) < len(data) + 600  # compresses below header+input


@needs_native
def test_native_vs_python_rans_bitstream(rng):
    # The pure-Python mirror must produce the identical stream so archives
    # are portable across backends.
    data = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8))
    native_blob = native_rans_compress(data)
    py_blob = entropy._py_rans_encode(data)
    assert native_blob == py_blob
    assert entropy._py_rans_decode(native_blob, len(data)) == data


@needs_native
def test_shared_freq_table(rng):
    # Shared-coder-table path: a table derived from a global histogram
    # encodes any plane drawn from that distribution.
    a = bytes(rng.integers(0, 64, size=2048, dtype=np.uint8))
    b = bytes(rng.integers(0, 64, size=2048, dtype=np.uint8))
    counts = np.bincount(
        np.frombuffer(a + b, dtype=np.uint8), minlength=256
    )
    table = entropy.normalized_freqs(counts)
    for data in (a, b):
        blob = native_rans_compress(data, table)
        assert native_rans_decompress(blob, len(data)) == data


def test_python_rans_fallback_roundtrip(rng):
    data = bytes(rng.integers(0, 16, size=3000, dtype=np.uint8))
    blob = entropy._py_rans_encode(data)
    assert entropy._py_rans_decode(blob, len(data)) == data


def test_normalized_freqs_properties(rng):
    counts = np.zeros(256, dtype=np.int64)
    counts[5] = 1
    counts[200] = 10**12
    freq = entropy.normalized_freqs(counts)
    assert int(freq.sum()) == 1 << 14
    assert freq[5] >= 1  # present symbols never get zero probability
    assert freq[7] == 0


@needs_native
def test_simd_scalar_bitstream_identity(rng):
    """The AVX-512 paths must emit byte-identical streams to the scalar
    fallback (RUSTYHGI_NO_SIMD=1) — checked via a subprocess because the
    toggle is read once per process."""
    import hashlib
    import os
    import subprocess
    import sys

    data = bytes(rng.integers(0, 64, 300_007, dtype=np.uint8))
    blob = native_rans_compress(data)
    assert native_rans_decompress(blob, len(data)) == data

    code = (
        "import sys, hashlib, numpy as np\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from rustyhgi_tpu.ops.native import native_rans_compress, native_rans_decompress\n"
        "rng = np.random.default_rng()\n"
        "import sys as s2\n"
        "data = s2.stdin.buffer.read()\n"
        "blob = native_rans_compress(data)\n"
        "assert native_rans_decompress(blob, len(data)) == data\n"
        "print(hashlib.sha256(blob).hexdigest())\n"
    )
    env = dict(os.environ)
    env["RUSTYHGI_NO_SIMD"] = "1"
    r = subprocess.run(
        [sys.executable, "-c", code], input=data, capture_output=True, env=env
    )
    assert r.returncode == 0, r.stderr[-500:]
    scalar_digest = r.stdout.decode().strip()
    assert scalar_digest == __import__("hashlib").sha256(blob).hexdigest()


def test_rans_encode_quotient_exact_at_reciprocal_failure_points():
    """The Alverson 32-bit reciprocal overshoots q = x/f for rare states
    >= 2^31 when f > 2^13 (majority symbol) — enough to corrupt archives.
    Verify the encoder's fixup at the analytically-worst states of every
    affected frequency (threshold x0 = 2^45 / (M*f - 2^45))."""
    import ctypes

    from rustyhgi_tpu.ops import native as nat

    lib = nat._load()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    lib.rans_encode_quotient.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
    lib.rans_encode_quotient.restype = ctypes.c_uint32
    checked = 0
    for f in range(8193, 16384, 7):  # sampled sweep; full range is slow
        K = 45
        M = ((1 << K) + f - 1) // f
        e = M * f - (1 << K)
        if e == 0:
            continue
        x0 = (1 << K) // e
        x_max = (4 << 16) * f
        if x0 >= x_max:
            continue
        start = (x0 // f) * f - 1
        for x in [start + k * f for k in range(4)] + [((x_max - 1) // f) * f - 1]:
            if x < f or x >= x_max:
                continue
            assert lib.rans_encode_quotient(x, f) == x // f, (f, x)
            checked += 1
    # the pair that produced the first observed corruption
    assert lib.rans_encode_quotient(3162365739, 14347) == 3162365739 // 14347
    assert checked > 500
