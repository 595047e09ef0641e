"""JAX lattice-pyramid codec: bit-exact agreement with the oracle.

The golden contract (SURVEY.md §7 step 2): for every shape, level depth,
and quantization preset, the device encode must produce the *identical*
residual grid bytes as the scalar oracle, and device decode must invert it
bit-exactly.
"""

import numpy as np
import pytest

from rustyhgi_tpu import HGICodec, QuantizationLevel, linear_error
from rustyhgi_tpu.oracle import oracle_decode, oracle_encode

from conftest import synthetic_image

SHAPES = [(8, 8), (12, 8), (17, 13), (32, 32), (31, 33), (64, 48), (1, 1)]


@pytest.mark.parametrize("quant", list(QuantizationLevel))
@pytest.mark.parametrize("shape", SHAPES)
def test_encode_matches_oracle(rng, quant, shape):
    image = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for levels in (1, 2, 3, 4):
        codec = HGICodec(levels=levels, quantization=quant)
        grid, recon = codec.encode_plane(image)
        want = oracle_encode(image, levels, quant)
        assert np.array_equal(np.asarray(grid), want), (shape, levels, quant)
        # the encoder's loop-carried reconstruction equals a decode pass
        assert np.array_equal(np.asarray(recon), oracle_decode(want, levels))


@pytest.mark.parametrize("shape", SHAPES)
def test_decode_matches_oracle(rng, shape):
    grid = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for levels in (1, 3):
        codec = HGICodec(levels=levels)
        got = np.asarray(codec.decode_plane(grid))
        assert np.array_equal(got, oracle_decode(grid, levels))


@pytest.mark.parametrize("quant", list(QuantizationLevel))
def test_roundtrip_error_bound(rng, quant):
    image = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    codec = HGICodec(levels=4, quantization=quant)
    grid, _ = codec.encode_plane(image)
    decoded = np.asarray(codec.decode_plane(grid))
    err = np.abs(image.astype(np.int32) - decoded.astype(np.int32))
    assert err.max() <= linear_error(quant)


def test_lossless_bit_exact_synthetic():
    image = synthetic_image(64, 48)
    codec = HGICodec(levels=4, quantization="lossless")
    grid, recon = codec.encode_plane(image)
    assert np.array_equal(np.asarray(recon), image)
    assert np.array_equal(np.asarray(codec.decode_plane(grid)), image)


def test_deep_levels(rng):
    # levels up to 8 incl. step > dim cases (SURVEY.md §5 long-context analogue)
    image = rng.integers(0, 256, size=(19, 23), dtype=np.uint8)
    for levels in (5, 6, 7, 8):
        codec = HGICodec(levels=levels, quantization="lossless")
        grid, _ = codec.encode_plane(image)
        assert np.array_equal(np.asarray(grid), oracle_encode(image, levels, QuantizationLevel.LOSSLESS))
        assert np.array_equal(np.asarray(codec.decode_plane(grid)), image)


def test_batched_encode_matches_single(rng):
    batch = rng.integers(0, 256, size=(5, 24, 16), dtype=np.uint8)
    codec = HGICodec(levels=3, quantization="medium")
    grids, recons = codec.encode_plane(batch)
    for i in range(batch.shape[0]):
        g, r = codec.encode_plane(batch[i])
        assert np.array_equal(np.asarray(grids[i]), np.asarray(g))
        assert np.array_equal(np.asarray(recons[i]), np.asarray(r))
    decoded = codec.decode_plane(grids)
    for i in range(batch.shape[0]):
        assert np.array_equal(
            np.asarray(decoded[i]), np.asarray(codec.decode_plane(grids[i]))
        )


def test_archive_end_to_end(rng):
    from rustyhgi_tpu import read_archive, write_archive

    image = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    codec = HGICodec(levels=4, quantization="low")
    archive = codec.encode(image)
    for fmt in ("hgi", "thgi"):
        blob = write_archive(archive, fmt)
        decoded = codec.decode(read_archive(blob))
        err = np.abs(image.astype(np.int32) - decoded.astype(np.int32))
        assert err.max() <= 10


def test_lena_lossless_bit_exact(lena):
    codec = HGICodec(levels=4, quantization="lossless")
    grid, recon = codec.encode_plane(lena)
    assert np.array_equal(np.asarray(recon), lena)
    assert np.array_equal(np.asarray(codec.decode_plane(grid)), lena)
    # spot-check against the oracle on the real image too
    want = oracle_encode(lena, 4, QuantizationLevel.LOSSLESS)
    assert np.array_equal(np.asarray(grid), want)


def test_metrics_shape(lena):
    codec = HGICodec(levels=4, quantization="medium")
    m = codec.test(lena)
    assert m["uncompressed"] == lena.size
    assert 0 < m["compressed"] < lena.size
    assert m["max_error"] <= m["error_bound"] == 20
    assert "Ratio:" in str(m)


@pytest.mark.parametrize("quant", [QuantizationLevel.LOSSLESS, QuantizationLevel.MEDIUM])
def test_left_top_predictor_matches_oracle(rng, quant):
    # LeftTop is the reference's bench-only strategy (interpolator.rs:15-28);
    # the library API exposes it for the same traversal-vs-math isolation.
    image = rng.integers(0, 256, size=(33, 21), dtype=np.uint8)
    for levels in (1, 3):
        codec = HGICodec(levels=levels, quantization=quant, predictor="left_top")
        grid, recon = codec.encode_plane(image)
        want = oracle_encode(image, levels, quant, predictor="left_top")
        assert np.array_equal(np.asarray(grid), want)
        decoded = np.asarray(codec.decode_plane(grid))
        assert np.array_equal(decoded, oracle_decode(want, levels, "left_top"))
        assert np.array_equal(np.asarray(recon), decoded)


def test_unknown_predictor_rejected():
    with pytest.raises(ValueError, match="predictor"):
        HGICodec(predictor="bilinear")


def test_extreme_levels_small_image(rng):
    # Nominal depths far beyond log2(dim) must stay O(H*W) (clamped to the
    # depths that touch pixels) and match the unclamped scalar oracle.
    image = rng.integers(0, 256, size=(12, 9), dtype=np.uint8)
    for levels in (10, 16):
        codec = HGICodec(levels=levels, quantization="medium")
        grid, recon = codec.encode_plane(image)
        want = oracle_encode(image, levels, QuantizationLevel.MEDIUM)
        assert np.array_equal(np.asarray(grid), want), levels
        assert np.array_equal(
            np.asarray(codec.decode_plane(grid)), oracle_decode(want, levels)
        )


def test_decode_fallback_preserves_predictor(rng):
    image = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    enc = HGICodec(3, "lossless", predictor="left_top")
    archive = enc.encode(image)
    # decoder constructed with a different nominal depth must not silently
    # fall back to the crossed predictor
    dec = HGICodec(5, "lossless", predictor="left_top")
    assert np.array_equal(dec.decode(archive), image)
