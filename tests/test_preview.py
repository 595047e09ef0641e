"""Progressive (preview) decode.

Contract: ``preview[i, j] == full_reconstruction[i * s, j * s]`` with
``s = 2**(levels - upto)`` — refinement levels never modify pixels of a
coarser lattice, so a prefix decode is exactly the full decode sampled.
The container tier additionally guarantees that only the payload prefix
is entropy-decoded for subband .thgi archives (every codec decodes
front-to-back).  No reference counterpart (decoder.rs always
reconstructs fully).
"""

import numpy as np
import pytest

from rustyhgi_tpu.models.codec import HGICodec
from rustyhgi_tpu.ops import pyramid
from rustyhgi_tpu.ops.quantizers import QuantizationLevel, quantize_fn
from rustyhgi_tpu.utils.container import (
    read_thgi_preview,
    split_grid_np,
    write_thgi,
)


def _image(h, w, seed=5):
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 3 + y * 2) // 3
    noise = np.random.default_rng(seed).integers(0, 9, (h, w))
    return ((base + noise) % 256).astype(np.uint8)


@pytest.mark.parametrize("shape", [(64, 64), (61, 83)])
@pytest.mark.parametrize("quant", ["lossless", "medium"])
def test_preview_equals_sampled_full(shape, quant):
    levels = 4
    img = _image(*shape)
    q = quantize_fn(QuantizationLevel.parse(quant))
    anchors, subbands, _ = pyramid.encode_subbands(img, levels, q)
    full = np.asarray(pyramid.decode_subbands(anchors, subbands, shape, levels))
    for upto in range(levels + 1):
        s = 1 << (levels - upto)
        pv = np.asarray(
            pyramid.decode_preview(anchors, subbands[:upto], shape, levels, upto)
        )
        expect = full[::s, ::s]
        assert pv.shape == expect.shape
        assert np.array_equal(pv, expect), (quant, shape, upto)


@pytest.mark.parametrize("codecs", [("deflate",), ("rans",), ("ctx",)])
def test_container_prefix_preview(codecs):
    img = _image(96, 80, seed=6)
    codec = HGICodec(3, "medium")
    archive = codec.encode(img)
    blob = write_thgi(archive, layouts=("subband",), codecs=codecs)
    full = codec.decode(archive)
    for upto in (0, 1, 3):
        meta, anchors, subbands, eff = read_thgi_preview(blob, upto)
        assert eff == upto
        pv = np.asarray(
            codec.decode_preview(
                anchors, subbands, (meta.height, meta.width), eff
            )
        )
        s = 1 << (3 - eff)
        assert np.array_equal(pv, full[::s, ::s]), (codecs, upto)


def test_container_preview_rowmajor_fallback():
    img = _image(40, 56, seed=7)
    codec = HGICodec(2, "lossless")
    archive = codec.encode(img)
    blob = write_thgi(archive, layouts=("rowmajor",))
    meta, anchors, subbands, eff = read_thgi_preview(blob, 1)
    ea, es = split_grid_np(archive.grid, 2)
    assert np.array_equal(anchors, ea)
    assert all(
        np.array_equal(a, b) for a, b in zip(subbands[0], es[0])
    )
    assert eff == 1


def test_preview_upto_clamps():
    img = _image(32, 32)
    codec = HGICodec(3, "lossless")
    archive = codec.encode(img)
    blob = write_thgi(archive, layouts=("subband",))
    meta, anchors, subbands, eff = read_thgi_preview(blob, 99)
    assert eff == 3  # clamped to the archive's level count
    pv = np.asarray(
        codec.decode_preview(anchors, subbands, (32, 32), eff)
    )
    assert np.array_equal(pv, codec.decode(archive))


def test_cli_preview(tmp_path):
    from rustyhgi_tpu.cli import main
    from rustyhgi_tpu.utils.imageio import save_gray, load_luma

    img = _image(64, 48, seed=8)
    src = tmp_path / "src.png"
    save_gray(str(src), img)
    for fmt in ("hgi", "thgi"):
        arc = tmp_path / f"a.{fmt}"
        out = tmp_path / f"pv_{fmt}.png"
        assert main([
            "encode", "-i", str(src), "-o", str(arc),
            "-l", "4", "-q", "lossless", "--format", fmt,
        ]) == 0
        assert main([
            "decode", "-i", str(arc), "-o", str(out), "--preview", "2",
        ]) == 0
        pv = load_luma(str(out))
        assert pv.shape == (16, 12)
        assert np.array_equal(pv, img[::4, ::4])  # lossless: exact samples


def test_write_fast_matches_slow_fast_path():
    """Fused device encode+bitpack is byte-identical to the two-step path."""
    from rustyhgi_tpu.utils.container import Archive, read_thgi, write_thgi

    img = _image(61, 83, seed=2)
    codec = HGICodec(4, "medium")
    blob = codec.write_fast(img)
    arch = Archive(
        codec.metadata_for(61, 83), np.asarray(codec.encode_plane(img)[0])
    )
    assert blob == write_thgi(arch, fast=True)
    assert np.array_equal(read_thgi(blob).grid, arch.grid)


def test_cli_fast_encode(tmp_path):
    from rustyhgi_tpu.cli import main
    from rustyhgi_tpu.utils.imageio import save_gray, load_luma

    img = _image(48, 64, seed=4)
    src, arc, out = tmp_path / "s.png", tmp_path / "a.thgi", tmp_path / "o.png"
    save_gray(str(src), img)
    assert main([
        "encode", "-i", str(src), "-o", str(arc),
        "--format", "thgi", "--fast", "-q", "lossless",
    ]) == 0
    assert main(["decode", "-i", str(arc), "-o", str(out)]) == 0
    assert np.array_equal(load_luma(str(out)), img)  # lossless roundtrip


@pytest.mark.parametrize("levels", [6, 8])
def test_deep_level_preview(levels):
    """Previews at depths where 2^levels exceeds the image dimension."""
    img = _image(40, 56, seed=15)
    q = quantize_fn(QuantizationLevel.LOSSLESS)
    anchors, subbands, _ = pyramid.encode_subbands(img, levels, q)
    eff = len(subbands)  # effective levels after the dimension clamp
    full = np.asarray(
        pyramid.decode_subbands(anchors, subbands, (40, 56), levels)
    )
    assert np.array_equal(full, img)
    for upto in (0, 1, eff):
        s = 1 << (eff - upto)
        pv = np.asarray(
            pyramid.decode_preview(anchors, subbands[:upto], (40, 56), levels, upto)
        )
        assert np.array_equal(pv, full[::s, ::s])


def test_left_top_predictor_preview():
    """Previews hold for the LeftTop predictor too (bench-only in the
    reference, library-reachable here)."""
    from rustyhgi_tpu.ops.predictors import cell_prediction_left_top

    img = _image(48, 48, seed=16)
    q = quantize_fn(QuantizationLevel.MEDIUM)
    anchors, subbands, _ = pyramid.encode_subbands(
        img, 3, q, predictor=cell_prediction_left_top
    )
    full = np.asarray(
        pyramid.decode_subbands(
            anchors, subbands, (48, 48), 3, predictor=cell_prediction_left_top
        )
    )
    pv = np.asarray(
        pyramid.decode_preview(
            anchors, subbands[:1], (48, 48), 3, 1,
            predictor=cell_prediction_left_top,
        )
    )
    assert np.array_equal(pv, full[::4, ::4])
