"""Oracle self-consistency tests.

These are the reference's unit tests done *right*: the reference's
test_error comparison is vacuous (lib.rs:61 rebinds `image` to the decoded
image and compares it with itself — SURVEY.md §4); here distortion is
checked decoded-vs-original, and lossless mode is checked for exact
equality.
"""

import numpy as np
import pytest

from rustyhgi_tpu.oracle import oracle_decode, oracle_encode
from rustyhgi_tpu.ops.quantizers import (
    QuantizationLevel,
    linear_error,
    linear_table,
)

from conftest import synthetic_image

ALL_LEVELS = list(QuantizationLevel)


@pytest.mark.parametrize("quant", ALL_LEVELS)
def test_error_bound_synthetic(quant):
    # Mirrors lib.rs:45-97 (12x8 synthetic, levels=3) with the intended check.
    image = synthetic_image(12, 8)
    grid = oracle_encode(image, levels=3, quantization=quant)
    decoded = oracle_decode(grid, levels=3)
    err = np.abs(image.astype(np.int32) - decoded.astype(np.int32))
    assert err.max() <= linear_error(quant)


def test_lossless_is_exact():
    image = synthetic_image(12, 8)
    grid = oracle_encode(image, 3, QuantizationLevel.LOSSLESS)
    assert np.array_equal(oracle_decode(grid, 3), image)


@pytest.mark.parametrize("quant", ALL_LEVELS)
@pytest.mark.parametrize("shape", [(8, 8), (12, 8), (17, 13), (1, 1), (5, 31)])
def test_error_bound_random_odd_shapes(rng, quant, shape):
    # Non-power-of-two dims exercise the bounds handling of
    # interpolator.rs:75-82 and the traverse stop conditions (utils.rs:22,30).
    image = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for levels in (1, 2, 3, 4):
        grid = oracle_encode(image, levels, quant)
        decoded = oracle_decode(grid, levels)
        err = np.abs(image.astype(np.int32) - decoded.astype(np.int32))
        assert err.max() <= linear_error(quant), (shape, levels)


def test_levels_zero_is_identity(rng):
    image = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    grid = oracle_encode(image, 0, QuantizationLevel.HIGH)
    assert np.array_equal(grid, image)  # every pixel is an anchor
    assert np.array_equal(oracle_decode(grid, 0), image)


def test_deep_levels_exceeding_dims(rng):
    # 2**levels > both dims: only (0,0) is an anchor (SURVEY.md §5).
    image = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    grid = oracle_encode(image, 4, QuantizationLevel.LOSSLESS)
    assert np.array_equal(oracle_decode(grid, 4), image)


def test_quantizer_table_properties():
    for quant in ALL_LEVELS:
        e = linear_error(quant)
        table = linear_table(quant)
        assert table.shape == (256,)
        scale = 2 * e + 1
        x = np.arange(256)
        expected = (((x + e) // scale) * scale) & 0xFF
        assert np.array_equal(table, expected.astype(np.uint8))
    assert np.array_equal(
        linear_table(QuantizationLevel.LOSSLESS), np.arange(256, dtype=np.uint8)
    )


def test_overflow_fixup_exercised(rng):
    # High-contrast random images hit the encoder.rs:56-60 fixup path;
    # the bound must hold regardless.
    image = rng.choice([0, 255], size=(16, 16)).astype(np.uint8)
    for quant in (QuantizationLevel.MEDIUM, QuantizationLevel.HIGH):
        grid = oracle_encode(image, 3, quant)
        decoded = oracle_decode(grid, 3)
        err = np.abs(image.astype(np.int32) - decoded.astype(np.int32))
        assert err.max() <= linear_error(quant)


def test_anchor_values_stored_raw(rng):
    image = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    levels = 3
    grid = oracle_encode(image, levels, QuantizationLevel.HIGH)
    step = 1 << levels
    assert np.array_equal(grid[::step, ::step], image[::step, ::step])
