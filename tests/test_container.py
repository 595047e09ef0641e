"""Container format tests: byte-exact .hgi layout + native .thgi."""

import struct
import zlib

import numpy as np
import pytest

from rustyhgi_tpu.ops.quantizers import QuantizationLevel
from rustyhgi_tpu.utils.container import (
    Archive,
    HGI_MAGIC,
    Interpolation,
    Metadata,
    read_archive,
    read_hgi,
    read_thgi,
    write_hgi,
    write_thgi,
)

from conftest import synthetic_image


def make_archive(w=8, h=8, levels=3, quant=QuantizationLevel.MEDIUM):
    grid = synthetic_image(w, h)
    meta = Metadata(quant, Interpolation.CROSSED, w, h, levels)
    return Archive(meta, grid)


def test_hgi_roundtrip():
    a = make_archive()
    b = read_hgi(write_hgi(a))
    assert b.metadata == a.metadata
    assert np.array_equal(b.grid, a.grid)


def test_hgi_byte_layout():
    # Validates every field of SURVEY.md §3.7 against a hand-built blob.
    a = make_archive(w=8, h=8, levels=3, quant=QuantizationLevel.MEDIUM)
    blob = write_hgi(a)
    assert blob[:4] == bytes([0x55, 0xA5, 0xAD, 0xBA])  # magic LE
    q, interp, w, h, scale = struct.unpack_from("<IIIIQ", blob, 4)
    assert (q, interp, w, h, scale) == (2, 0, 8, 8, 3)
    payload = zlib.decompress(blob[28:], -15)  # raw DEFLATE, no header
    (n,) = struct.unpack_from("<Q", payload, 0)
    assert n == 64
    assert payload[8 : 8 + 64] == a.grid.tobytes()
    (width,) = struct.unpack_from("<Q", payload, 8 + 64)
    assert width == 8
    assert len(payload) == 8 + 64 + 8


def test_hgi_bad_magic_rejected():
    blob = b"\x00\x00\x00\x00" + b"x" * 40
    with pytest.raises(ValueError, match="magic"):
        read_hgi(blob)


def test_thgi_roundtrip_and_not_larger():
    a = make_archive(w=33, h=17, levels=4)
    thgi = write_thgi(a)
    hgi = write_hgi(a)
    b = read_thgi(thgi)
    assert b.metadata == a.metadata
    assert np.array_equal(b.grid, a.grid)
    # native container never beats .hgi by less than the header delta
    assert len(thgi) <= len(hgi) + 16


def test_read_archive_autodetect():
    a = make_archive()
    for blob in (write_hgi(a), write_thgi(a)):
        b = read_archive(blob)
        assert np.array_equal(b.grid, a.grid)


def test_grid_shape_validation():
    meta = Metadata(QuantizationLevel.LOW, Interpolation.CROSSED, 4, 4, 2)
    with pytest.raises(ValueError, match="shape"):
        Archive(meta, np.zeros((3, 4), dtype=np.uint8))


def test_hostile_header_rejected():
    import struct

    from rustyhgi_tpu.utils.container import HGI_MAGIC

    # Absurd dimensions must be rejected before any allocation.
    meta = struct.pack("<IIIIQ", 0, 0, 0xFFFFFFFF, 0xFFFFFFFF, 4)
    blob = struct.pack("<I", HGI_MAGIC) + meta + b"\x00" * 16
    with pytest.raises(ValueError, match="implausible"):
        read_hgi(blob)
    blob = struct.pack("<I", HGI_MAGIC) + struct.pack(
        "<IIIIQ", 0, 0, 4, 4, 10**6
    ) + b"\x00" * 16
    with pytest.raises(ValueError, match="implausible"):
        read_hgi(blob)


def test_truncated_metadata_rejected():
    import struct

    from rustyhgi_tpu.utils.container import HGI_MAGIC

    with pytest.raises(ValueError):
        read_hgi(struct.pack("<I", HGI_MAGIC) + b"\x00" * 4)


def test_rans_mt_chunked_roundtrip():
    import numpy as np

    from rustyhgi_tpu.utils.container import (
        _CODEC_RANS_MT,
        _rans_mt_decode,
        _rans_mt_encode,
        write_thgi,
    )

    rng = np.random.default_rng(9)
    # iid skewed bytes: no LZ matches, so rANS beats DEFLATE and the
    # writer must select the MT codec for this >=1MB plane
    p_dist = np.exp(-np.arange(256) / 6.0)
    p_dist /= p_dist.sum()
    raw = rng.choice(
        np.arange(256, dtype=np.uint8), p=p_dist, size=3 * 1024 * 1024
    ).tobytes()
    body = _rans_mt_encode(raw)
    assert _rans_mt_decode(body, len(raw)) == raw

    # a large archive exercises the MT codec through the container path
    grid = np.frombuffer(raw[: 2048 * 1024], np.uint8).reshape(1024, 2048)
    meta = Metadata(QuantizationLevel.MEDIUM, Interpolation.CROSSED, 2048, 1024, 4)
    blob = write_thgi(Archive(meta, grid))
    import struct as _struct

    _, tag = _struct.unpack_from("<BB", blob, 28)
    assert tag == _CODEC_RANS_MT  # the MT candidate actually won
    back = read_archive(blob)
    assert np.array_equal(back.grid, grid)


@pytest.mark.parametrize("fmt", ["hgi", "thgi"])
def test_corruption_fuzz_never_crashes(rng, fmt):
    """Random byte mutations must yield clean errors or valid parses —
    never hangs, segfaults, or unbounded allocations."""
    import zlib

    from rustyhgi_tpu.utils.container import write_archive

    grid = (rng.integers(-6, 7, (64, 96)) % 256).astype(np.uint8)
    meta = Metadata(QuantizationLevel.MEDIUM, Interpolation.CROSSED, 96, 64, 3)
    blob = bytearray(write_archive(Archive(meta, grid), fmt))
    for trial in range(60):
        mutated = bytearray(blob)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= int(rng.integers(1, 256))
        try:
            a = read_archive(bytes(mutated))
            assert a.grid.shape == (a.metadata.height, a.metadata.width)
        except (ValueError, zlib.error, OverflowError):
            pass  # clean rejection is the expected outcome


def test_truncation_fuzz_never_crashes(rng):
    import zlib

    from rustyhgi_tpu.utils.container import write_archive

    grid = (rng.integers(-6, 7, (32, 48)) % 256).astype(np.uint8)
    meta = Metadata(QuantizationLevel.LOW, Interpolation.CROSSED, 48, 32, 3)
    for fmt in ("hgi", "thgi"):
        blob = write_archive(Archive(meta, grid), fmt)
        for cut in range(0, len(blob), max(1, len(blob) // 40)):
            try:
                read_archive(blob[:cut])
            except (ValueError, zlib.error, struct.error, EOFError):
                pass


# -- shared-table rANS + tiled v2 container (multi-host tier) ---------------


def test_shared_table_write_read_roundtrip():
    from rustyhgi_tpu.ops.entropy import normalized_freqs

    a = make_archive(w=32, h=24, levels=3)
    freqs = normalized_freqs(np.bincount(a.grid.reshape(-1), minlength=256))
    blob = write_thgi(a, freqs=freqs, codecs=("rans_shared",))
    b = read_thgi(blob, freqs=freqs)
    assert np.array_equal(b.grid, a.grid)
    # the 512-byte table prefix is stripped from the stream
    full = write_thgi(a, codecs=("rans",))
    assert len(blob) <= len(full) - 500


def test_shared_table_requires_freqs_on_read():
    from rustyhgi_tpu.ops.entropy import normalized_freqs

    a = make_archive(w=32, h=24, levels=3)
    freqs = normalized_freqs(np.bincount(a.grid.reshape(-1), minlength=256))
    blob = write_thgi(a, freqs=freqs, codecs=("rans_shared",))
    with pytest.raises(ValueError, match="shared coder table"):
        read_thgi(blob)
    # and a WRONG table must not silently decode to the right bytes
    wrong = normalized_freqs(np.arange(1, 257))
    try:
        c = read_thgi(blob, freqs=wrong)
        assert not np.array_equal(c.grid, a.grid)
    except ValueError:
        pass  # stream-level rejection is equally acceptable


def test_shared_table_validation():
    a = make_archive()
    with pytest.raises(ValueError, match="summing"):
        write_thgi(a, freqs=np.ones(256, np.uint16))


def test_shared_table_noncovering_freqs_never_reach_native():
    # A table assigning freq 0 to a byte present in the payload must not
    # reach the native coder (division by zero -> SIGFPE, whole-process
    # abort).  The rans_shared candidate is guarded: the write falls back
    # to the other codecs and the archive stays decodable without freqs.
    a = make_archive(w=32, h=24, levels=3)
    present = np.unique(a.grid)
    assert present.size >= 2
    bad = np.zeros(256, np.int64)
    # all mass on one symbol that DOES occur, zero for the rest
    bad[int(present[0])] = 1 << 14
    blob = write_thgi(a, freqs=bad.astype(np.uint16))
    b = read_thgi(blob)  # fell back to a self-contained codec
    assert np.array_equal(b.grid, a.grid)


def test_thgit2_container_roundtrip_and_crc():
    from rustyhgi_tpu.utils.container import (
        parse_thgit,
        thgit2_block_frame,
        thgit2_header,
    )

    blocks = [write_thgi(make_archive(w=16, h=16)) for _ in range(4)]
    blob = thgit2_header(16, 32, 32, 4, None) + b"".join(
        thgit2_block_frame(b) for b in blocks
    )
    tile, w, h, got, freqs = parse_thgit(blob)
    assert (tile, w, h, freqs) == (16, 32, 32, None)
    assert got == blocks

    # flip one payload byte -> the CRC names the corrupt block
    bad = bytearray(blob)
    bad[-3] ^= 0x5A
    with pytest.raises(ValueError, match="CRC mismatch in block 3"):
        parse_thgit(bytes(bad))

    # truncation -> precise error, no allocation bomb
    with pytest.raises(ValueError, match="truncated"):
        parse_thgit(blob[: len(blob) // 2])


def test_thgit2_header_stores_table_once():
    from rustyhgi_tpu.ops.entropy import normalized_freqs
    from rustyhgi_tpu.utils.container import parse_thgit, thgit2_header

    freqs = normalized_freqs(np.bincount(make_archive().grid.reshape(-1), minlength=256))
    blob = thgit2_header(8, 8, 8, 0, freqs)
    tile, w, h, blocks, got = parse_thgit(blob)
    assert blocks == [] and np.array_equal(got, freqs)
    assert len(blob) == 21 + 512


def test_archive_print_debug_dump(capsys):
    """Grid::print parity (reference grid.rs:29-33): every byte in
    row-major order, space-separated, trailing space."""
    import io

    from rustyhgi_tpu.utils.container import Archive, Metadata
    from rustyhgi_tpu.ops.quantizers import QuantizationLevel

    grid = np.arange(6, dtype=np.uint8).reshape(2, 3)
    arch = Archive(
        Metadata(QuantizationLevel.LOSSLESS, 0, 3, 2, 1), grid
    )
    buf = io.StringIO()
    arch.print(buf)
    assert buf.getvalue() == "0 1 2 3 4 5 "
    arch.print()
    assert capsys.readouterr().out == "0 1 2 3 4 5 "
