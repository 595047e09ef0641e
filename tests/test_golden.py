"""Golden-archive regression tests.

The committed fixtures pin the container byte formats and the codec's
residual-grid bytes; any drift in layout, entropy framing, or kernel
semantics fails here even if roundtrips still succeed.
"""

import os

import numpy as np
import pytest

from rustyhgi_tpu import HGICodec, QuantizationLevel
from rustyhgi_tpu.oracle import oracle_encode
from rustyhgi_tpu.utils.container import (
    read_archive,
    write_hgi,
)

from conftest import synthetic_image

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
STEM = "synthetic_16x12_l3_medium"


@pytest.fixture(scope="module")
def golden_grid():
    return np.load(os.path.join(GOLDEN, STEM + "_grid.npy"))


def test_golden_grid_still_produced(golden_grid):
    img = synthetic_image(16, 12)
    assert np.array_equal(
        oracle_encode(img, 3, QuantizationLevel.MEDIUM), golden_grid
    )
    codec = HGICodec(3, QuantizationLevel.MEDIUM)
    assert np.array_equal(np.asarray(codec.encode_plane(img)[0]), golden_grid)


@pytest.mark.parametrize("ext", ["hgi", "thgi"])
def test_golden_archives_parse(golden_grid, ext):
    with open(os.path.join(GOLDEN, f"{STEM}.{ext}"), "rb") as f:
        archive = read_archive(f.read())
    assert archive.metadata.width == 16
    assert archive.metadata.height == 12
    assert archive.metadata.scale_level == 3
    assert archive.metadata.quantization_level == QuantizationLevel.MEDIUM
    assert np.array_equal(archive.grid, golden_grid)


def test_golden_hgi_bytes_reproduced(golden_grid):
    # The .hgi writer must be byte-deterministic (fixed DEFLATE settings):
    # re-serializing the parsed archive reproduces the committed bytes.
    path = os.path.join(GOLDEN, STEM + ".hgi")
    with open(path, "rb") as f:
        blob = f.read()
    assert write_hgi(read_archive(blob)) == blob
