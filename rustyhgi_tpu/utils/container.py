"""Container formats.

Two containers live here:

* ``.hgi`` — a byte-exact reader/writer for the reference's archive layout
  (reference: src/archive.rs:13-55, src/grid.rs:1-5), so archives produced by
  this framework decode with the reference binary and vice versa.
* ``.thgi`` — this framework's native container: same metadata, but the
  residual plane is entropy-coded with the best of {raw DEFLATE, static rANS}
  per archive (SURVEY.md §7 step 8), which is never larger than the
  reference's single-choice DEFLATE stream.

Reference ``.hgi`` byte layout (SURVEY.md §3.7; bincode 1.0 defaults are
fixed-width little-endian ints, u32 enum tags, u64 length prefixes):

```
offset 0:  u32 LE magic 0xBAAD_A555                      (archive.rs:13,32)
offset 4:  u32 LE quantization_level tag                 (quantizator.rs:3-8)
           u32 LE interpolation tag                      (interpolator.rs:5-9)
           u32 LE width, u32 LE height                   (archive.rs:19-20)
           u64 LE scale_level                            (archive.rs:21)
offset 28: raw DEFLATE (level 9, no zlib header) of      (archive.rs:36-38)
             u64 LE buffer length (= width*height)
             width*height residual bytes, row-major      (grid.rs:2-3)
             u64 LE width                                (grid.rs:4)
```
"""

from __future__ import annotations

import dataclasses
import struct
import zlib

import numpy as np

from ..dyadic import cdiv as _cdiv, effective_levels as _effective_levels
from ..ops.quantizers import QuantizationLevel

__all__ = [
    "HGI_MAGIC",
    "THGI_MAGIC",
    "Interpolation",
    "Metadata",
    "Archive",
    "write_hgi",
    "read_hgi",
    "write_thgi",
    "read_thgi",
    "read_thgi_preview",
    "write_archive",
    "read_archive",
]

HGI_MAGIC = 0xBAAD_A555  # archive.rs:13
THGI_MAGIC = 0x7B61_A555  # native container magic ("tpu" variant)

# Decompression-bomb guard: the largest single plane a hostile header may
# declare (1 GPix ~= 1 GB of pixels).  Gigapixel images go through the
# tiled container (per-tile metadata stays small); raise this module
# global only for trusted single-plane workflows.
MAX_PLANE_PIXELS = 1 << 30

_METADATA = struct.Struct("<IIIIQ")  # qlevel, interp, width, height, scale


class Interpolation:
    """Interpolator tags, serde enum order (interpolator.rs:4-9)."""

    CROSSED = 0
    LINE = 1  # metadata-only in the reference (no implementation)
    PREVIOUS = 2


@dataclasses.dataclass(frozen=True)
class Metadata:
    """Archive metadata (archive.rs:16-22)."""

    quantization_level: QuantizationLevel
    interpolation: int
    width: int
    height: int
    scale_level: int

    def pack(self) -> bytes:
        return _METADATA.pack(
            int(self.quantization_level),
            int(self.interpolation),
            self.width,
            self.height,
            self.scale_level,
        )

    @classmethod
    def unpack(cls, raw: bytes) -> "Metadata":
        if len(raw) < _METADATA.size:
            raise ValueError("truncated metadata")
        q, interp, w, h, scale = _METADATA.unpack(raw)
        # Sanity bounds on untrusted input: cap the plane (see
        # MAX_PLANE_PIXELS) and the pyramid depth so a hostile 28-byte
        # header cannot drive multi-GB allocations downstream; degenerate
        # one-sided-zero dimensions are rejected too (0x0 stays legal —
        # an empty plane is representable).
        if w * h > MAX_PLANE_PIXELS or scale > 32 or (w == 0) != (h == 0):
            raise ValueError(
                f"implausible archive dimensions {w}x{h} levels={scale}"
            )
        return cls(QuantizationLevel(q), interp, w, h, scale)


@dataclasses.dataclass
class Archive:
    """An encoded image: metadata + residual grid plane (archive.rs:24-28)."""

    metadata: Metadata
    grid: np.ndarray  # uint8 [height, width]

    def __post_init__(self) -> None:
        self.grid = np.ascontiguousarray(self.grid, dtype=np.uint8)
        if self.grid.shape != (self.metadata.height, self.metadata.width):
            raise ValueError(
                f"grid shape {self.grid.shape} does not match metadata "
                f"{(self.metadata.height, self.metadata.width)}"
            )

    def print(self, file=None) -> None:
        """Debug dump of the residual grid (reference grid.rs:29-33).

        Same output convention as ``Grid::print``: every byte in
        row-major order, space-separated, no trailing newline.
        """
        import sys

        out = sys.stdout if file is None else file
        out.write(" ".join(map(str, self.grid.reshape(-1))) + " ")


def _deflate_one(payload: bytes, strategy: int) -> bytes:
    co = zlib.compressobj(9, zlib.DEFLATED, -15, 9, strategy)
    return co.compress(payload) + co.flush()


def _deflate_best(payload: bytes) -> bytes:
    # Raw DEFLATE, max effort, no zlib/gzip framing — stream-compatible
    # with flate2::Compression::best()'s DeflateEncoder (archive.rs:36-38);
    # any valid raw-DEFLATE stream decodes in the reference.  Z_FILTERED
    # biases toward shorter-match/literal coding and measures 1-4.5%
    # smaller on HGI residual planes; emit the smaller of the two
    # (deterministic: both strategies are deterministic at fixed settings).
    return min(
        (
            _deflate_one(payload, zlib.Z_FILTERED),
            _deflate_one(payload, zlib.Z_DEFAULT_STRATEGY),
        ),
        key=len,
    )


def _inflate_raw(payload: bytes, max_size: int = None) -> bytes:
    """Raw-DEFLATE inflate, output capped at ``max_size`` bytes.

    The cap is the bomb guard: readers derive the exact expected payload
    size from the (already bounds-checked) header before inflating, so a
    tiny hostile stream cannot expand into an unbounded allocation.  A
    stream that would produce MORE than ``max_size`` bytes is rejected
    (the reference format always knows its exact payload size).
    """
    if max_size is None:
        return zlib.decompress(payload, -15)
    do = zlib.decompressobj(-15)
    out = do.decompress(payload, max_size)
    # Anything left beyond the cap (more compressed input pending, or
    # buffered output) means the stream disagrees with the header.
    if do.unconsumed_tail and do.decompress(do.unconsumed_tail, 1):
        raise ValueError("payload larger than declared size")
    if do.flush(1):
        raise ValueError("payload larger than declared size")
    return out


def _grid_payload(archive: Archive) -> bytes:
    # bincode(Grid): u64 len, bytes, u64 width (grid.rs:1-5 field order).
    grid = archive.grid
    return b"".join(
        (
            struct.pack("<Q", grid.size),
            grid.tobytes(),
            struct.pack("<Q", archive.metadata.width),
        )
    )


def write_hgi(archive: Archive) -> bytes:
    """Serialize to the reference's byte-exact .hgi layout (archive.rs:31-41)."""
    return b"".join(
        (
            struct.pack("<I", HGI_MAGIC),
            archive.metadata.pack(),
            _deflate_best(_grid_payload(archive)),
        )
    )



def _magic(data: bytes) -> int:
    """Leading u32 magic of an archive; ValueError (not struct.error) when short."""
    if len(data) < 4:
        raise ValueError("truncated archive")
    return struct.unpack_from("<I", data, 0)[0]

def read_hgi(data: bytes) -> Archive:
    """Parse a .hgi archive (archive.rs:43-55)."""
    magic = _magic(data)
    if magic != HGI_MAGIC:
        raise ValueError("incorrect magic number")  # archive.rs:48
    meta = Metadata.unpack(data[4 : 4 + _METADATA.size])
    n = meta.width * meta.height
    # Inflate at most the header-derived payload size (u64 len + grid +
    # u64 width) — a hostile body cannot allocate beyond the declared
    # (bounds-checked) plane.
    payload = _inflate_raw(data[4 + _METADATA.size :], max_size=8 + n + 8)
    if len(payload) < 8 + n + 8:
        raise ValueError("truncated grid payload")
    (length,) = struct.unpack_from("<Q", payload, 0)
    if length != n:
        raise ValueError(
            f"grid length {length} does not match {meta.width}x{meta.height}"
        )
    buf = np.frombuffer(payload, dtype=np.uint8, count=n, offset=8)
    (width,) = struct.unpack_from("<Q", payload, 8 + n)
    if width != meta.width:
        raise ValueError("grid width does not match metadata width")
    grid = buf.reshape(meta.height, meta.width).copy()
    return Archive(meta, grid)


# --------------------------------------------------------------------------
# Native container (.thgi): layouts x entropy codecs, smallest wins.
# --------------------------------------------------------------------------

_CODEC_DEFLATE = 0
_CODEC_RANS = 1
_CODEC_BITPACK = 2  # device-side Pallas bit-plane pack (fast mode)
_CODEC_RANS_MT = 3  # two independent rANS chunks, coded in parallel
_CODEC_CTX = 4  # context-adaptive binary range coder (subband layout only)
_CODEC_RANS_SHARED = 5  # rANS with an EXTERNAL shared freq table (multi-host)
_CODEC_CTX_MT = 6  # chunk-parallel ctx coder (subband layout only)
_CODEC_RANS_TPU = 7  # device lane-parallel rANS (ops.tpurans, fast mode)

_RANS_TABLE_BYTES = 512  # u16 LE freq[256] prefix of every rANS stream


def _check_freqs(freqs) -> np.ndarray:
    """Validate and canonicalize a shared rANS table (u16[256], sum 2**14)."""
    table = np.ascontiguousarray(freqs, dtype=np.uint16)
    if table.shape != (256,) or int(table.sum()) != 1 << 14:
        raise ValueError("shared freq table must be u16[256] summing to 2**14")
    return table

_LAYOUT_ROWMAJOR = 0
_LAYOUT_SUBBAND = 1


def subband_shapes(height: int, width: int, levels: int):
    """Canvas-padded shapes of (anchors, per-level quads).

    Returns ``(anchor_shape, [quad_shape per level])`` — quad shapes are
    the packed coarse-lattice shapes, coarsest level first, derived from
    the 2**levels canvas so the byte stream needs no shape framing.
    ``levels`` is clamped to the depths that touch pixels (the encoder
    applies the identical clamp).
    """
    levels = _effective_levels(levels, height, width)
    step = 1 << levels
    hp, wp = _cdiv(height, step) * step, _cdiv(width, step) * step
    anchor = (hp // step, wp // step)
    quads = []
    for level in range(levels):
        s2 = 1 << (levels - level)  # coarse spacing of this level
        quads.append((hp // s2, wp // s2))
    return anchor, quads


def split_grid_np(grid: np.ndarray, levels: int):
    """Row-major residual plane -> (anchors, subbands) on host (NumPy).

    Subband order matches rustyhgi_tpu.ops.pyramid.encode_subbands:
    anchors, then per level (coarsest first) the (q01, q10, q11) quads.
    Host-side strided slicing is cheap (this is not the device path).
    """
    h, w = grid.shape
    levels = _effective_levels(levels, h, w)
    step = 1 << levels
    hp, wp = _cdiv(h, step) * step, _cdiv(w, step) * step
    canvas = np.zeros((hp, wp), dtype=np.uint8)
    canvas[:h, :w] = grid
    anchors = canvas[::step, ::step].copy()
    subbands = []
    for level in range(levels):
        s1 = 1 << (levels - level - 1)
        q01 = canvas[0 :: 2 * s1, s1 :: 2 * s1].copy()
        q10 = canvas[s1 :: 2 * s1, 0 :: 2 * s1].copy()
        q11 = canvas[s1 :: 2 * s1, s1 :: 2 * s1].copy()
        subbands.append((q01, q10, q11))
    return anchors, subbands


def assemble_grid_np(
    anchors: np.ndarray, subbands, height: int, width: int, levels: int
) -> np.ndarray:
    """Inverse of :func:`split_grid_np` (crops the canvas padding)."""
    levels = _effective_levels(levels, height, width)
    step = 1 << levels
    hp, wp = _cdiv(height, step) * step, _cdiv(width, step) * step
    canvas = np.zeros((hp, wp), dtype=np.uint8)
    canvas[::step, ::step] = anchors
    for level, (q01, q10, q11) in enumerate(subbands):
        s1 = 1 << (levels - level - 1)
        canvas[0 :: 2 * s1, s1 :: 2 * s1] = q01
        canvas[s1 :: 2 * s1, 0 :: 2 * s1] = q10
        canvas[s1 :: 2 * s1, s1 :: 2 * s1] = q11
    return canvas[:height, :width].copy()


def _subband_payload(archive: Archive) -> bytes:
    anchors, subbands = split_grid_np(
        archive.grid, archive.metadata.scale_level
    )
    parts = [anchors.tobytes()]
    for quads in subbands:
        parts.extend(q.tobytes() for q in quads)
    return b"".join(parts)


_MT_THRESHOLD = 1 << 20  # chunked-parallel rANS pays off above ~1 MB
_MT_POOL = None
_CANDIDATE_POOL = None


def _candidate_pool():
    # Pool for racing write_thgi's entropy candidates; distinct from the
    # rANS-MT chunk pool so a candidate that itself uses that pool
    # cannot deadlock it.
    global _CANDIDATE_POOL
    if _CANDIDATE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _CANDIDATE_POOL = ThreadPoolExecutor(4)
    return _CANDIDATE_POOL


def _mt_pool():
    # Persistent 2-thread pool: the native coder's scratch buffers are
    # thread_local, so fresh threads per call would re-pay the page-fault
    # cost of multi-MB allocations every time.
    global _MT_POOL
    if _MT_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _MT_POOL = ThreadPoolExecutor(2)
    return _MT_POOL


def _rans_mt_encode(raw: bytes) -> bytes:
    """Split into two halves and rANS-code them on two threads.

    Each half is a standard self-contained rANS stream (the native coder
    releases the GIL, so two ctypes calls genuinely overlap on two
    cores).  Body: u64 LE first-chunk compressed length, then the two
    streams.
    """
    from ..ops.entropy import rans_encode

    mid = len(raw) // 2
    view = memoryview(raw)  # zero-copy halves; the coder releases the GIL
    a, b = _mt_pool().map(rans_encode, (view[:mid], view[mid:]))
    return struct.pack("<Q", len(a)) + a + b


def _rans_mt_decode(body: bytes, raw_size: int) -> bytes:
    from ..ops.entropy import rans_decode

    (len_a,) = struct.unpack_from("<Q", body, 0)
    mid = raw_size // 2
    ex = _mt_pool()
    fa = ex.submit(rans_decode, body[8 : 8 + len_a], mid)
    fb = ex.submit(rans_decode, body[8 + len_a :], raw_size - mid)
    return fa.result() + fb.result()


def _entropy_candidate_jobs(
    raw: bytes, fast: bool = False, allowed=None, freqs=None
):
    """(codec tag, thunk) candidates for one payload.

    Thunks are pure and GIL-releasing (zlib, the native coders via
    ctypes, device dispatch), so the writer races them on a thread pool;
    a thunk that raises (e.g. the native backend is absent) just drops
    its candidate.  DEFLATE's two strategies are separate jobs so the
    slowest stage parallelizes too.
    """

    def keep(tag):
        return allowed is None or tag in allowed

    jobs = []
    if fast:
        # Device-coded fast modes: end-to-end encode cost is device
        # compute + transfer, no host entropy crunch.  The lane-parallel
        # rANS (ops.tpurans) is the default — entropy-optimal within a
        # few percent of the host coder; the bit-plane pack remains
        # available by explicit request (codecs=["bitpack"]).
        if allowed is None or _CODEC_RANS_TPU in allowed:
            from ..ops.tpurans import encode_bytes

            jobs.append((_CODEC_RANS_TPU, lambda: encode_bytes(raw)))
        elif keep(_CODEC_BITPACK):
            from ..ops.pallas_kernels import pack_bytes

            jobs.append(
                (
                    _CODEC_BITPACK,
                    lambda: pack_bytes(np.frombuffer(raw, np.uint8)),
                )
            )
        return jobs
    if keep(_CODEC_DEFLATE):
        for strategy in (zlib.Z_FILTERED, zlib.Z_DEFAULT_STRATEGY):
            jobs.append(
                (_CODEC_DEFLATE, lambda s=strategy: _deflate_one(raw, s))
            )
    if len(raw) >= _MT_THRESHOLD:
        # Large planes: two-chunk parallel coder (both halves walk
        # both host cores); ~520 B table overhead vs single-stream.
        if keep(_CODEC_RANS_MT):
            jobs.append((_CODEC_RANS_MT, lambda: _rans_mt_encode(raw)))
    elif keep(_CODEC_RANS):

        def _rans():
            from ..ops.entropy import rans_encode

            return rans_encode(raw)

        jobs.append((_CODEC_RANS, _rans))
    if freqs is not None and keep(_CODEC_RANS_SHARED):
        # Shared-table rANS (multi-host tier): the stream is the standard
        # rANS layout with its 512-byte table prefix STRIPPED — the table
        # lives once in the enclosing tiled container (or is supplied by
        # the caller on read), so N blocks pay the table cost once.
        def _rans_shared():
            from ..ops.entropy import rans_encode

            # A caller-supplied table must cover every byte present in
            # the payload: a zero frequency makes the NATIVE coder divide
            # by zero (SIGFPE — whole-process abort, unlike the Python
            # mirror whose exception the candidate race swallows).
            present = np.unique(np.frombuffer(raw, np.uint8))
            if present.size and not np.all(freqs[present] > 0):
                missing = [int(b) for b in present[freqs[present] == 0][:8]]
                raise ValueError(
                    f"shared freq table assigns 0 to payload bytes {missing}"
                )
            return rans_encode(raw, freqs)[_RANS_TABLE_BYTES:]

        jobs.append((_CODEC_RANS_SHARED, _rans_shared))
    return jobs


def _ctx_pieces(meta: Metadata):
    from ..ops.ctxcoder import piece_table

    a_shape, q_shapes = subband_shapes(meta.height, meta.width, meta.scale_level)
    return piece_table(a_shape, q_shapes)


def _ctx_shift(meta: Metadata) -> int:
    # Adaptation speed is metadata-derived (so decoders recover it):
    # lossy residual statistics drift with content — fast shift-4
    # adaptation measures ~5% smaller; lossless prefers the steadier 5.
    return 5 if meta.quantization_level == QuantizationLevel.LOSSLESS else 4


_CODEC_NAMES = {
    "deflate": _CODEC_DEFLATE,
    "rans": _CODEC_RANS,
    "bitpack": _CODEC_BITPACK,
    "rans_mt": _CODEC_RANS_MT,
    "ctx": _CODEC_CTX,
    "rans_shared": _CODEC_RANS_SHARED,
    "ctx_mt": _CODEC_CTX_MT,
    "rans_tpu": _CODEC_RANS_TPU,
}


def write_thgi(
    archive: Archive,
    layouts=("rowmajor", "subband"),
    fast: bool = False,
    codecs=None,
    freqs=None,
) -> bytes:
    """Serialize to the native container.

    Layout: u32 LE magic, packed metadata, u8 layout tag, u8 codec tag,
    u64 LE raw size, entropy-coded payload.  Layouts: ``rowmajor`` (the
    grid plane) and ``subband`` (anchors + per-level residual quads in the
    device kernel's natural order; shapes derived from metadata, no extra
    framing).  The writer emits whichever (layout, codec) combination is
    smallest, so .thgi is never larger than the .hgi body.  With
    ``fast=True`` the payload is device-bit-packed instead of host
    entropy-coded (throughput over size).

    The subband layout additionally tries the context-adaptive range
    coder (ops/ctxcoder.py): zigzag bit-trees with per-level 2D-activity
    contexts, measured 3-17% smaller than the best of {DEFLATE-9, rANS}
    on the reference's own test images.

    ``codecs`` optionally restricts the candidate entropy codecs to a
    subset of {"deflate", "rans", "rans_mt", "bitpack", "ctx",
    "rans_shared"}; default tries everything the mode allows and keeps
    the smallest.

    ``freqs`` (u16[256] summing to 2**14, from
    ``ops.entropy.normalized_freqs``) adds the shared-table rANS
    candidate: the block is coded against that external table and the
    512-byte table prefix is omitted from the stream — the multi-host
    tier stores the table once per tiled archive.  Such blocks decode
    only with the same table (``read_thgi(data, freqs=...)``).
    """
    if freqs is not None:
        freqs = _check_freqs(freqs)
    if fast and "rowmajor" in layouts:
        # Fast mode is throughput-over-size: one device bit-pack pass on
        # one layout (row-major needs no host subband split), not a size
        # race between two identically-coded layouts.
        layouts = ("rowmajor",)
    allowed = None
    if codecs is not None:
        try:
            allowed = {_CODEC_NAMES[c] for c in codecs}
        except KeyError as e:
            raise ValueError(
                f"unknown codec {e.args[0]!r}; "
                f"expected one of {sorted(_CODEC_NAMES)}"
            ) from None

    def keep(tag):
        return allowed is None or tag in allowed

    jobs = []  # (layout, tag, raw_len, thunk)
    if "rowmajor" in layouts:
        raw = archive.grid.tobytes()
        for tag, fn in _entropy_candidate_jobs(raw, fast, allowed, freqs):
            jobs.append((_LAYOUT_ROWMAJOR, tag, len(raw), fn))
    if "subband" in layouts and archive.metadata.scale_level > 0:
        raw = _subband_payload(archive)
        for tag, fn in _entropy_candidate_jobs(raw, fast, allowed, freqs):
            jobs.append((_LAYOUT_SUBBAND, tag, len(raw), fn))
        if not fast and (keep(_CODEC_CTX) or keep(_CODEC_CTX_MT)):
            # By default the ctx candidate runs only with the native
            # coder present: the pure-Python spec implementation is a
            # correctness fallback (~0.1 MB/s), fine for reading archives
            # but a silent multi-minute stall as a write-side size
            # candidate.  An explicit codecs= request still forces it.
            from ..ops.native import available as _native_available

            if allowed is not None or _native_available():
                from ..ops.ctxcoder import (
                    ctx_encode,
                    ctx_encode_mt,
                    ctx_mt_chunks,
                )

                pieces = _ctx_pieces(archive.metadata)
                shift = _ctx_shift(archive.metadata)
                # Large payloads use the chunk-parallel framing (the
                # serial coder is the slowest stage by far — VERDICT #9
                # of round 1); small ones keep the single stream, whose
                # size is strictly better.  An explicit codecs= request
                # for ctx_mt is honored at any size.
                forced_mt = allowed is not None and _CODEC_CTX_MT in allowed
                if keep(_CODEC_CTX_MT) and (
                    forced_mt or ctx_mt_chunks(len(raw)) > 1
                ):
                    jobs.append(
                        (
                            _LAYOUT_SUBBAND,
                            _CODEC_CTX_MT,
                            len(raw),
                            lambda: ctx_encode_mt(raw, pieces, shift),
                        )
                    )
                elif keep(_CODEC_CTX):
                    jobs.append(
                        (
                            _LAYOUT_SUBBAND,
                            _CODEC_CTX,
                            len(raw),
                            lambda: ctx_encode(raw, pieces, shift),
                        )
                    )

    # Race the candidates on a pool (distinct from the rANS-MT chunk pool
    # so nested submission cannot deadlock); every coder releases the GIL.
    candidates = []
    futures = [
        (layout, tag, raw_len, _candidate_pool().submit(fn))
        for layout, tag, raw_len, fn in jobs
    ]
    for layout, tag, raw_len, fut in futures:
        try:
            candidates.append((layout, tag, raw_len, fut.result()))
        except Exception:
            pass  # backend unavailable; other candidates still race
    if not candidates:
        raise ValueError(
            f"no valid candidates for layouts={layouts!r} codecs={codecs!r}"
        )
    layout, tag, raw_len, body = min(candidates, key=lambda c: len(c[3]))
    return _thgi_frame(archive.metadata, layout, tag, raw_len, body)


def _thgi_frame(
    meta: Metadata, layout: int, codec: int, raw_size: int, body: bytes
) -> bytes:
    """Frame a .thgi container: header + entropy-coded body.

    The single authority for the header layout — codec.write_fast and
    write_thgi both emit through this.
    """
    return b"".join(
        (
            struct.pack("<I", THGI_MAGIC),
            meta.pack(),
            struct.pack("<BBQ", layout, codec, raw_size),
            body,
        )
    )


def _expected_raw_size(meta: Metadata, layout: int) -> int:
    """Exact decompressed payload size a layout implies for a metadata.

    Derived entirely from the (bounds-checked) header, this is the bomb
    guard for every entropy decoder: the declared raw_size MUST equal it
    before any decode allocates.
    """
    if layout == _LAYOUT_ROWMAJOR:
        return meta.width * meta.height
    if layout == _LAYOUT_SUBBAND:
        a_shape, q_shapes = subband_shapes(
            meta.height, meta.width, meta.scale_level
        )
        return a_shape[0] * a_shape[1] + 3 * sum(h * w for h, w in q_shapes)
    raise ValueError(f"unknown layout tag {layout}")


def _parse_thgi_header(data: bytes):
    """Parse a .thgi header -> (metadata, layout, codec tag, raw_size, body).

    Validates the declared raw_size against the layout's header-derived
    expectation, so no decoder downstream ever allocates more than the
    (bounds-checked) metadata implies.
    """
    magic = _magic(data)
    if magic != THGI_MAGIC:
        raise ValueError("incorrect magic number")
    off = 4
    meta = Metadata.unpack(data[off : off + _METADATA.size])
    off += _METADATA.size
    if len(data) < off + struct.calcsize("<BBQ"):
        raise ValueError("truncated archive")
    layout, tag, raw_size = struct.unpack_from("<BBQ", data, off)
    off += struct.calcsize("<BBQ")
    if raw_size != _expected_raw_size(meta, layout):
        raise ValueError(
            f"declared payload size {raw_size} does not match layout"
        )
    return meta, layout, tag, raw_size, data[off:]


def _shared_rans_decode(body: bytes, raw_size: int, freqs) -> bytes:
    """Decode a table-stripped shared-rANS stream by re-prepending freqs."""
    from ..ops.entropy import rans_decode

    if freqs is None:
        raise ValueError(
            "archive uses a shared coder table; pass freqs= (u16[256])"
        )
    return rans_decode(_check_freqs(freqs).tobytes() + body, raw_size)


def read_thgi_payload(data: bytes, freqs=None):
    """Parse a .thgi container to ``(metadata, layout, raw_payload, raw_size)``.

    ``raw_payload`` is the decompressed byte stream and ``raw_size`` the
    header's declared size (validated against layout expectations by the
    callers); for the subband layout, :func:`read_thgi_subbands` slices it
    into arrays without the row-major assembly, enabling the device's
    direct subband decode.  ``freqs`` is the shared coder table for
    blocks written with ``write_thgi(..., freqs=...)``.
    """
    meta, layout, tag, raw_size, body = _parse_thgi_header(data)
    if tag == _CODEC_DEFLATE:
        raw = _inflate_raw(body, max_size=raw_size)
    elif tag == _CODEC_RANS:
        from ..ops.entropy import rans_decode

        raw = rans_decode(body, raw_size)
    elif tag == _CODEC_RANS_SHARED:
        raw = _shared_rans_decode(body, raw_size, freqs)
    elif tag == _CODEC_BITPACK:
        from ..ops.pallas_kernels import unpack_bytes

        raw = unpack_bytes(body, expected_n=raw_size).tobytes()
    elif tag == _CODEC_RANS_MT:
        raw = _rans_mt_decode(body, raw_size)
    elif tag == _CODEC_RANS_TPU:
        from ..ops.tpurans import decode_bytes

        raw = decode_bytes(body, expected_n=raw_size).tobytes()
    elif tag == _CODEC_CTX:
        if layout != _LAYOUT_SUBBAND:
            raise ValueError("ctx codec requires the subband layout")
        from ..ops.ctxcoder import ctx_decode

        raw = ctx_decode(body, _ctx_pieces(meta), _ctx_shift(meta))
    elif tag == _CODEC_CTX_MT:
        if layout != _LAYOUT_SUBBAND:
            raise ValueError("ctx codec requires the subband layout")
        from ..ops.ctxcoder import ctx_decode_mt

        raw = ctx_decode_mt(body, _ctx_pieces(meta), _ctx_shift(meta))
    else:
        raise ValueError(f"unknown entropy codec tag {tag}")
    if len(raw) < raw_size:
        raise ValueError("truncated payload")
    return meta, layout, raw, raw_size


def _slice_subbands(meta: Metadata, raw: bytes, raw_size: int, upto=None):
    """Slice a subband payload into (anchors, subbands[:upto]).

    ``upto=None`` means all levels and validates the full payload size;
    an explicit ``upto`` slices just the prefix (progressive decode).
    """
    a_shape, q_shapes = subband_shapes(meta.height, meta.width, meta.scale_level)
    if upto is None:
        expected = a_shape[0] * a_shape[1] + 3 * sum(h * w for h, w in q_shapes)
        if raw_size != expected:
            raise ValueError(
                f"subband payload size {raw_size} != expected {expected}"
            )
        upto = len(q_shapes)
    pos = 0

    def take(shape):
        nonlocal pos
        n = shape[0] * shape[1]
        arr = np.frombuffer(raw, np.uint8, count=n, offset=pos).reshape(shape)
        pos += n
        return arr

    anchors = take(a_shape)
    subbands = [tuple(take(s) for _ in range(3)) for s in q_shapes[:upto]]
    return anchors, subbands


def read_thgi_subbands(data: bytes, freqs=None):
    """Parse a subband-layout .thgi to ``(metadata, anchors, subbands)``.

    Raises ValueError for row-major archives (callers fall back to
    :func:`read_thgi`).  The arrays feed
    ``HGICodec.decode_subbands`` directly — no grid assembly, no device
    re-split.
    """
    meta, layout, raw, raw_size = read_thgi_payload(data, freqs)
    if layout != _LAYOUT_SUBBAND:
        raise ValueError("archive is not in subband layout")
    anchors, subbands = _slice_subbands(meta, raw, raw_size)
    return meta, anchors, subbands


def read_thgi_preview(data: bytes, upto: int, freqs=None):
    """Progressive read: entropy-decode only the payload prefix needed for
    a level-``upto`` preview (see ops.pyramid.decode_preview).

    Returns ``(metadata, anchors, subbands_prefix, upto)`` where ``upto``
    is clamped to the archive's effective level count.  Subband-layout
    archives decode only the prefix (cost proportional to preview area
    for DEFLATE/rANS/ctx streams — all of them decode front-to-back);
    row-major and bitpack archives fall back to a full decode + split.
    """
    meta, layout, tag, raw_size, body = _parse_thgi_header(data)

    a_shape, q_shapes = subband_shapes(meta.height, meta.width, meta.scale_level)
    upto = max(0, min(int(upto), len(q_shapes)))
    need = a_shape[0] * a_shape[1] + 3 * sum(
        h * w for h, w in q_shapes[:upto]
    )

    if layout != _LAYOUT_SUBBAND or tag in (_CODEC_BITPACK, _CODEC_RANS_TPU):
        # bitpack and the lane-interleaved device rANS have no
        # front-to-back prefix property; full decode + split.
        archive = read_thgi(data, freqs)
        anchors, subbands = split_grid_np(archive.grid, meta.scale_level)
        return meta, anchors, subbands[:upto], upto

    if tag == _CODEC_DEFLATE:
        raw = zlib.decompressobj(-15).decompress(body, need)
    elif tag == _CODEC_RANS:
        from ..ops.entropy import rans_decode

        raw = rans_decode(body, need)
    elif tag == _CODEC_RANS_SHARED:
        raw = _shared_rans_decode(body, need, freqs)
    elif tag == _CODEC_RANS_MT:
        from ..ops.entropy import rans_decode

        (len_a,) = struct.unpack_from("<Q", body, 0)
        mid = raw_size // 2
        raw = rans_decode(body[8 : 8 + len_a], min(need, mid))
        if need > mid:
            raw += rans_decode(body[8 + len_a :], need - mid)
    elif tag == _CODEC_CTX:
        from ..ops.ctxcoder import ctx_decode

        pieces = _ctx_pieces(meta)[: 1 + 3 * upto]
        raw = ctx_decode(body, pieces, _ctx_shift(meta))
    elif tag == _CODEC_CTX_MT:
        from ..ops.ctxcoder import ctx_decode_mt

        # chunk split derives from the FULL piece table; only chunks
        # covering the preview prefix are decoded.
        raw = ctx_decode_mt(
            body, _ctx_pieces(meta), _ctx_shift(meta), upto_bytes=need
        )
    else:
        raise ValueError(f"unknown entropy codec tag {tag}")
    if len(raw) < need:
        raise ValueError("truncated payload")

    anchors, subbands = _slice_subbands(meta, raw, need, upto=upto)
    return meta, anchors, subbands, upto


def read_preview(data: bytes, upto: int, freqs=None):
    """Magic-dispatching preview read for single-plane archives.

    `.thgi` archives go through :func:`read_thgi_preview` (prefix
    entropy decode); `.hgi` archives fall back to a full read + host
    split.  Returns ``(metadata, anchors, subbands_prefix, upto)``.
    """
    magic = _magic(data)
    if magic == THGI_MAGIC:
        return read_thgi_preview(data, upto, freqs)
    archive = read_hgi(data)
    meta = archive.metadata
    anchors, subbands = split_grid_np(archive.grid, meta.scale_level)
    upto = max(0, min(int(upto), len(subbands)))
    return meta, anchors, subbands[:upto], upto


def read_thgi(data: bytes, freqs=None) -> Archive:
    """Parse a .thgi container into an :class:`Archive` (any layout)."""
    meta, layout, raw, raw_size = read_thgi_payload(data, freqs)

    if layout == _LAYOUT_ROWMAJOR:
        if raw_size != meta.width * meta.height:
            raise ValueError("payload size does not match dimensions")
        grid = np.frombuffer(
            raw, dtype=np.uint8, count=raw_size
        ).reshape(meta.height, meta.width)
        return Archive(meta, grid.copy())
    if layout == _LAYOUT_SUBBAND:
        anchors, subbands = _slice_subbands(meta, raw, raw_size)
        grid = assemble_grid_np(
            anchors, subbands, meta.height, meta.width, meta.scale_level
        )
        return Archive(meta, grid)
    raise ValueError(f"unknown layout tag {layout}")


def write_archive(archive: Archive, fmt: str = "hgi", freqs=None) -> bytes:
    if fmt == "hgi":
        if freqs is not None:
            raise ValueError(".hgi is the fixed reference layout; "
                             "shared tables need fmt='thgi'")
        return write_hgi(archive)
    if fmt == "thgi":
        return write_thgi(archive, freqs=freqs)
    raise ValueError(f"unknown container format {fmt!r}")


def read_archive(data: bytes, freqs=None) -> Archive:
    """Auto-detect container format from the magic."""
    magic = _magic(data)
    if magic == HGI_MAGIC:
        return read_hgi(data)
    if magic == THGI_MAGIC:
        return read_thgi(data, freqs)
    raise ValueError("incorrect magic number")


# --------------------------------------------------------------------------
# Tiled multi-block container (.thgit v2): gigapixel planes as independent
# per-tile archives with per-block CRC32 (failure detection, VERDICT #8)
# and an optional once-per-archive shared rANS table (multi-host tier).
# The reference has no multi-stream container at all (SURVEY.md §5).
# --------------------------------------------------------------------------

THGIT_MAGIC = 0x7161A555  # v1 (legacy: no CRC, no shared table)
THGIT2_MAGIC = 0x7161A556  # v2: u8 flags [+ table], u64 len + u32 crc blocks

_THGIT2_FLAG_TABLE = 1


def thgit2_header(tile: int, width: int, height: int, n_blocks: int,
                  freqs=None) -> bytes:
    """Serialize a .thgit v2 stream header.

    Layout: u32 LE magic, u32 tile, u32 width, u32 height, u32 n_blocks,
    u8 flags (bit0: shared rANS table follows), [512 B u16 LE table].
    Blocks follow as ``u64 LE length, u32 LE crc32(block), block bytes``
    in row-major tile order; each block is a standalone .hgi/.thgi
    archive (possibly table-stripped shared-rANS coded).
    """
    flags = 0
    table = b""
    if freqs is not None:
        flags |= _THGIT2_FLAG_TABLE
        table = _check_freqs(freqs).tobytes()
    return (
        struct.pack(
            "<IIIIIB", THGIT2_MAGIC, tile, width, height, n_blocks, flags
        )
        + table
    )


def thgit2_block_frame(block: bytes) -> bytes:
    """Frame one tile block: u64 LE length + u32 LE CRC32 + bytes."""
    return struct.pack("<QI", len(block), zlib.crc32(block)) + block


def parse_thgit(data: bytes):
    """Parse a tiled container (v1 or v2) with integrity checking.

    Returns ``(tile, width, height, blocks, freqs)`` where ``blocks`` is
    the complete list of per-tile archives in row-major order and
    ``freqs`` the shared rANS table (or None).  v2 blocks are CRC32
    verified; a mismatch raises ValueError naming the block index —
    the precise corrupt-block surfacing of the failure-detection tier.
    """
    if len(data) < 20:
        raise ValueError("truncated tiled archive")
    magic, tile, width, height, n = struct.unpack_from("<IIIII", data, 0)
    if magic == THGIT_MAGIC:
        off, v2 = 20, False
        freqs = None
    elif magic == THGIT2_MAGIC:
        if len(data) < 21:
            raise ValueError("truncated tiled archive")
        (flags,) = struct.unpack_from("<B", data, 20)
        off, v2 = 21, True
        freqs = None
        if flags & _THGIT2_FLAG_TABLE:
            if len(data) < off + _RANS_TABLE_BYTES:
                raise ValueError("truncated shared table")
            freqs = np.frombuffer(
                data, dtype="<u2", count=256, offset=off
            ).copy()
            off += _RANS_TABLE_BYTES
    else:
        raise ValueError("incorrect magic number")
    if tile == 0:
        raise ValueError("implausible tiled header (zero tile size)")
    blocks = []
    for i in range(n):
        hdr = 12 if v2 else 8
        if off + hdr > len(data):
            raise ValueError(f"truncated at block {i}/{n}")
        if v2:
            blen, crc = struct.unpack_from("<QI", data, off)
        else:
            (blen,) = struct.unpack_from("<Q", data, off)
            crc = None
        off += hdr
        if blen > len(data) - off:
            raise ValueError(f"truncated at block {i}/{n}")
        block = data[off : off + blen]
        off += blen
        if crc is not None and zlib.crc32(block) != crc:
            raise ValueError(f"CRC mismatch in block {i}/{n}")
        blocks.append(block)
    return tile, width, height, blocks, freqs
