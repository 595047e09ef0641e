"""Subband-layout tests: the device kernel's natural output format."""

import numpy as np
import pytest

import jax

from rustyhgi_tpu.models.codec import HGICodec
from rustyhgi_tpu.ops import pyramid
from rustyhgi_tpu.ops.quantizers import QuantizationLevel, quantize_fn
from rustyhgi_tpu.utils.container import (
    Archive,
    Interpolation,
    Metadata,
    assemble_grid_np,
    read_thgi,
    split_grid_np,
    write_thgi,
)


@pytest.mark.parametrize("shape", [(32, 32), (17, 29), (64, 48)])
@pytest.mark.parametrize("levels", [1, 3, 4])
def test_split_assemble_roundtrip_np(rng, shape, levels):
    grid = rng.integers(0, 256, size=shape, dtype=np.uint8)
    anchors, subbands = split_grid_np(grid, levels)
    back = assemble_grid_np(anchors, subbands, *shape, levels)
    assert np.array_equal(back, grid)


@pytest.mark.parametrize("quant", [QuantizationLevel.LOSSLESS, QuantizationLevel.HIGH])
def test_device_subbands_match_grid_split(rng, quant):
    image = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    levels = 3
    q = quantize_fn(quant)
    grid, recon = jax.jit(lambda im: pyramid.encode_plane(im, levels, q))(image)
    anchors, subbands, recon2 = jax.jit(
        lambda im: pyramid.encode_subbands(im, levels, q)
    )(image)
    assert np.array_equal(np.asarray(recon2), np.asarray(recon))
    want_a, want_s = split_grid_np(np.asarray(grid), levels)
    assert np.array_equal(np.asarray(anchors), want_a)
    for lvl in range(levels):
        for got, want in zip(subbands[lvl], want_s[lvl]):
            assert np.array_equal(np.asarray(got), want), lvl


def test_device_decode_subbands(rng):
    image = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
    levels = 4
    q = quantize_fn(QuantizationLevel.MEDIUM)
    anchors, subbands, recon = jax.jit(
        lambda im: pyramid.encode_subbands(im, levels, q)
    )(image)
    decoded = jax.jit(
        lambda a, s: pyramid.decode_subbands(a, s, image.shape, levels)
    )(anchors, subbands)
    assert np.array_equal(np.asarray(decoded), np.asarray(recon))


def test_assemble_grid_device_matches_np(rng):
    image = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    levels = 3
    q = quantize_fn(QuantizationLevel.LOW)
    grid, _ = jax.jit(lambda im: pyramid.encode_plane(im, levels, q))(image)
    anchors, subbands, _ = jax.jit(
        lambda im: pyramid.encode_subbands(im, levels, q)
    )(image)
    assembled = jax.jit(
        lambda a, s: pyramid.assemble_grid(a, s, image.shape)
    )(anchors, subbands)
    assert np.array_equal(np.asarray(assembled), np.asarray(grid))


def test_thgi_subband_layout_roundtrip(rng):
    grid = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    meta = Metadata(QuantizationLevel.MEDIUM, Interpolation.CROSSED, 53, 37, 4)
    archive = Archive(meta, grid)
    for layouts in (("rowmajor",), ("subband",), ("rowmajor", "subband")):
        blob = write_thgi(archive, layouts=layouts)
        back = read_thgi(blob)
        assert np.array_equal(back.grid, grid), layouts
        assert back.metadata == meta
    both = write_thgi(archive)
    assert len(both) <= min(
        len(write_thgi(archive, layouts=("rowmajor",))),
        len(write_thgi(archive, layouts=("subband",))),
    )


def test_thgi_levels0_rowmajor_only(rng):
    grid = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    meta = Metadata(QuantizationLevel.LOSSLESS, Interpolation.CROSSED, 8, 8, 0)
    blob = write_thgi(Archive(meta, grid))
    assert np.array_equal(read_thgi(blob).grid, grid)


def test_read_thgi_subbands_direct(rng):
    from rustyhgi_tpu.utils.container import read_thgi_subbands

    grid = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    meta = Metadata(QuantizationLevel.LOW, Interpolation.CROSSED, 56, 40, 3)
    blob = write_thgi(Archive(meta, grid), layouts=("subband",))
    m2, anchors, subbands = read_thgi_subbands(blob)
    assert m2 == meta
    want_a, want_s = split_grid_np(grid, 3)
    assert np.array_equal(anchors, want_a)
    for lvl in range(3):
        for got, want in zip(subbands[lvl], want_s[lvl]):
            assert np.array_equal(got, want)
    with pytest.raises(ValueError, match="subband"):
        read_thgi_subbands(write_thgi(Archive(meta, grid), layouts=("rowmajor",)))
