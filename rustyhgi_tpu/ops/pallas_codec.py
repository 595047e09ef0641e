"""Fused Pallas TPU codec: whole-pyramid encode/decode in one kernel.

The XLA path (ops.pyramid) is compute-bound ~10x above the v5e HBM floor
because its dominant ops are dyadic *lane relayouts* (uint16 bitcast
splits / interleaves), which run far below elementwise VPU rate.  This
module removes nearly all of them with a planar dataflow:

* the canvas enters the kernel bitcast to **uint32 words** (4 pixels per
  lane); extracting byte ``rx`` of row-residue ``ry`` yields the 16
  stride-4 planes ``D[ry][rx]`` with *pure elementwise shifts* plus one
  cheap sublane reshape — no lane relayout at all;
* the two finest pyramid levels (93.75% of pixels for levels>=2) read and
  write only those planes: cell corners are plane selections plus
  single-step rolls, the Crossed rounding tree (reference
  src/interpolator.rs:41-55) and the quantize/overflow-fixup closed loop
  (src/encoder.rs:53-64) are elementwise on them;
* coarser levels recurse on the stride-4 sub-lattice ``D[0][0]`` — 1/16
  of the area — where a transpose makes lane splits sublane-cheap; the
  cost decays geometrically (4**-depth);
* the output is the **row-major residual grid** (the reference's own
  Grid form, src/grid.rs:8-27): grid rows are re-packed into uint32
  words elementwise, so the .hgi-ready layout costs nothing extra.

Tiling: the grid dimension runs over (batch, row-tiles).  Each tile
reads its rows plus a bottom *halo* — ``2^L`` rows for lossless encode
(predictions read only source-lattice rows <= tile_end, SURVEY.md §3.5),
``2^(L+1)`` for closed-loop encode and decode (a corner at row tile_end
is reconstructed at coarser levels, whose own corners cascade at most
``sum(2^k, k<=L) < 2^(L+1)`` rows further down).  Halo rows are computed
redundantly and cropped, keeping tiles fully independent.

Semantics are bit-exact vs rustyhgi_tpu.oracle (the reference golden
model) for every shape/levels/preset/predictor; tests/test_pallas_codec.py
fuzzes the matrix.  On CPU (tests) kernels run in interpreter mode.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dyadic import cdiv, effective_levels
from .quantizers import LinearQuantizer, NoOpQuantizer

__all__ = [
    "supported",
    "supported_subbands",
    "encode_plane_pallas",
    "encode_subbands_pallas",
    "decode_plane_pallas",
    "assemble_grid_pallas",
    "decode_subbands_pallas",
]

_I32 = jnp.int32
_U8 = jnp.uint8
_U32 = jnp.uint32

# Plane element type.  int16 would double VPU lane throughput, but this
# Mosaic version legalizes neither sub-32-bit shifts (arith.shrsi on
# vector<...xi16>) nor int16 rank-changing reshapes, so planes stay int32.
_PT = _I32

# Widest canvas the row-tiled kernel accepts: VMEM holds a few int32
# planes of (tile_rows/4, Wp/4); beyond this the XLA path takes over.
_MAX_WIDTH = 16384
_BASE_TILE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vma(x):
    """Varying-mesh-axes of ``x``'s aval (empty outside shard_map).

    Every pallas_call out_shape inherits the input's vma so the kernels
    compose with ``shard_map(check_vma=True)`` — outputs vary over
    exactly the mesh axes the input does (parallel.sharded routes the
    production kernel through shard_map; ADVICE r4 #3).
    """
    return jax.typeof(x).vma


# -- planar helpers (pure jnp; run identically compiled and interpreted) ----

# Per-trace value cache.  Mosaic does not CSE repeated broadcasted_iota /
# mask chains (measured ~100us of a 250us 1080p-x8 kernel rebuilding the
# same edge masks), so every iota and boundary mask is built once per
# kernel trace and reused.  Installed by _encode_tile/_decode_tile; plain
# dict keyed by (kind, shape, params) — tracing is single-threaded.
_CACHE: Optional[dict] = None


def _cached(key, build):
    c = _CACHE
    if c is None:
        return build()
    v = c.get(key)
    if v is None:
        v = c[key] = build()
    return v


def _iota(shape, axis):
    return _cached(
        ("iota", shape, axis), lambda: lax.broadcasted_iota(_I32, shape, axis)
    )


def _shift_lane(p: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = p[i, j+1]; zero fill at the canvas right edge.

    Planes always span the full canvas width, so the lane edge *is* the
    canvas edge and zero fill reproduces the reference's
    out-of-bounds-corners-read-0 rule (src/interpolator.rs:75-82).
    """
    r = jnp.roll(p, -1, axis=-1)
    m = _cached(
        ("ledge", p.shape),
        lambda: _iota(p.shape, p.ndim - 1) < p.shape[-1] - 1,
    )
    return jnp.where(m, r, 0)


def _shift_sub(p: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = p[i+1, j]; zero fill at the block bottom.

    The bottom row is either true canvas bottom padding (zeros — matches
    OOB-reads-0) or the tile halo tail, whose values never reach in-tile
    outputs (halo sizing above).
    """
    r = jnp.roll(p, -1, axis=-2)
    m = _cached(
        ("sedge", p.shape),
        lambda: _iota(p.shape, p.ndim - 2) < p.shape[-2] - 1,
    )
    return jnp.where(m, r, 0)


# NOTE on lane packing: Mosaic cannot legalize sub-32-bit vector shifts,
# so the int16 route to doubled VPU throughput is closed.  A SWAR scheme
# (two images per int32 lane, fields at bits 0/16) was built and measured
# on v5e: encode 47.0 GPix/s vs 73.5 without (the field-isolation masks
# cost more than the halved lane count saves), decode +4.5% — and 2-entry
# batch-dim blocks with OOB row reads fault the TPU worker process.
# Removed; one image per lane everywhere.


def _avg(a, b):
    """(a + b + 1) >> 1 per pixel (round-half-up; interpolator.rs:41-46)."""
    return (a + b + 1) >> 1


def _tree_crossed(tl, tr, bl, br):
    """The exact integer rounding tree of src/interpolator.rs:41-55."""
    t = _avg(tl, tr) + _avg(bl, br) + _avg(tl, bl) + _avg(tr, br)
    return t >> 2


def _tree_left_top(tl, tr, bl, br):
    """LeftTop predictor (src/interpolator.rs:15-28): the cell origin."""
    return tl


_TREES = {"crossed": _tree_crossed, "left_top": _tree_left_top}


def _planes_k(X: jnp.ndarray, k: int):
    """Split an (m, n) int32 lattice into its k*k stride-k planes.

    ``out[ry][rx][i, j] == X[k*i + ry, k*j + rx]``.  Column residues are
    separated on the transposed array (sublane reshape), then each
    column plane is transposed back and row-split — the only lane
    relayouts in the kernel, all at recursion depth >= 1 (<= 1/16 area).
    """
    m, n = X.shape
    ct = X.T.reshape(n // k, k, m)
    out = [[None] * k for _ in range(k)]
    for rx in range(k):
        c = ct[:, rx, :].T.reshape(m // k, k, n // k)
        for ry in range(k):
            out[ry][rx] = c[:, ry, :]
    return out


def _assemble(planes) -> jnp.ndarray:
    """Inverse of :func:`_planes_k`: k*k stride-k planes -> (m, n) array."""
    k = len(planes)
    mq, nq = planes[0][0].shape
    cols = []
    for rx in range(k):
        stacked = jnp.stack([planes[ry][rx] for ry in range(k)], axis=1)
        cols.append(stacked.reshape(mq * k, nq))  # all rows, cols ≡ rx
    t = jnp.stack([c.T for c in cols], axis=1)  # (nq, k, mq*k)
    return t.reshape(nq * k, mq * k).T


class _Masks:
    """In-image masks for closed-loop recon (reference OOB contract).

    A plane position (i, j) with row/col offsets (oy, ox) and steps
    (sy, sx) maps to canvas pixel (row_base + oy + i*sy, ox + j*sx);
    reconstruction outside the true (h, w) image is forced to 0 so
    corner reads of padded positions agree with the reference's
    out-of-bounds-reads-0 rule.  Axes fully covered by the image are
    statically skipped; ``None`` means no masking needed at all.
    """

    def __init__(self, h, w, rows_total, wp, row_base):
        self.h, self.w = h, w
        self.need_y = rows_total is None or rows_total > h
        self.need_x = wp > w
        self.row_base = row_base

    def __call__(self, shape, oy, sy, ox, sx):
        if not (self.need_y or self.need_x):
            return None

        def build():
            m = None
            if self.need_y:
                # row_base + oy + sy*i < h  <=>  i < ceil((h-row_base-oy)/sy)
                thr = (self.h - self.row_base - oy + sy - 1) // sy
                m = _iota(shape, 0) < thr
            if self.need_x:
                thrx = (self.w - ox + sx - 1) // sx  # static Python int
                mx = _iota(shape, 1) < thrx
                m = mx if m is None else (m & mx)
            return m

        return _cached(("mask", shape, oy, sy, ox, sx), build)


_NO_MASK = lambda shape, oy, sy, ox, sx: None


def _code(fine, pred, quantize, mask):
    """One closed-loop residual step (src/encoder.rs:53-64).

    Returns (grid_byte, recon_byte) as int32 in [0, 255].  ``quantize``
    None means the statically-lossless path: q == diff, the overflow
    fixup cannot trigger, and recon == fine exactly.
    """
    diff = (fine - pred) & 255
    if quantize is None:
        return diff, fine
    q = quantize(diff)
    fix = ((pred + q) > 255) != ((pred + diff) > 255)
    g = jnp.where(fix, diff, q)
    r = (pred + g) & 255
    if mask is not None:
        r = jnp.where(mask, r, 0)
    return g, r


# -- encode -----------------------------------------------------------------


def _encode_core(D, lrem, quantize, tree, maskf, sy, sx, sub=False,
                 emit_rows=None):
    """Two pyramid levels on a planar-decomposed lattice + recursion.

    ``D[ry][rx]`` are the 16 stride-4 planes of the current lattice
    (spacing (sy, sx) in canvas pixels).  Returns ``(grid_planes,
    recon_planes, subinfo)`` — 4x4 plane lists (``recon_planes`` is None
    on the lossless path, where recon == source).  With ``sub=True`` the
    recursion collects the SUBBAND emission instead of assembling a
    sub-grid: ``grid_planes[0][0]`` is None and ``subinfo`` is
    ``(anchor_plane, levels_list)`` per :func:`_sub_arr`; ``sub=False``
    returns ``subinfo=None``.  ``emit_rows``: see :func:`_sub_arr`.
    """
    lossless = quantize is None
    S = D[0][0]
    subinfo = None
    if lrem == 2:
        gsub, rsub = S, S  # anchors: raw values (src/encoder.rs:26-37)
        if sub:
            rq = None if emit_rows is None else emit_rows >> 2
            gsub, subinfo = None, (_crop_plane(S, rq), [])
    elif sub:
        anc, levels_sub, rsub = _sub_arr(
            S, lrem - 2, quantize, tree, maskf, 4 * sy, 4 * sx,
            emit_rows=None if emit_rows is None else emit_rows >> 2,
        )
        gsub, subinfo = None, (anc, levels_sub)
    else:
        gsub, rsub = _encode_arr(S, lrem - 2, quantize, tree, maskf, 4 * sy, 4 * sx)

    # Level A: coarse spacing 4, fine spacing 2 (relative to this lattice).
    C = S if lossless else rsub
    trs = _shift_lane(C)
    bls = _shift_sub(C)
    brs = _shift_sub(trs)
    P = tree(C, trs, bls, brs)
    gA01, rA01 = _code(D[0][2], P, quantize, maskf(P.shape, 0, 4 * sy, 2 * sx, 4 * sx))
    gA10, rA10 = _code(D[2][0], P, quantize, maskf(P.shape, 2 * sy, 4 * sy, 0, 4 * sx))
    gA11, rA11 = _code(D[2][2], P, quantize, maskf(P.shape, 2 * sy, 4 * sy, 2 * sx, 4 * sx))

    # Level B: coarse spacing 2, fine spacing 1.  The spacing-2 recon
    # lattice is exactly {C, rA01, rA10, rA11} by coordinate identity.
    if lossless:
        c00, c01, c10, c11 = S, D[0][2], D[2][0], D[2][2]
    else:
        c00, c01, c10, c11 = C, rA01, rA10, rA11
    sl00 = _shift_lane(c00)
    sl10 = _shift_lane(c10)
    ss00 = _shift_sub(c00)
    ss01 = _shift_sub(c01)
    preds = {
        (0, 0): tree(c00, c01, c10, c11),
        (0, 1): tree(c01, sl00, c11, sl10),
        (1, 0): tree(c10, c11, ss00, ss01),
        (1, 1): tree(c11, sl10, ss01, _shift_sub(sl00)),
    }

    gp = [[None] * 4 for _ in range(4)]
    rp = [[None] * 4 for _ in range(4)]
    gp[0][0], rp[0][0] = gsub, rsub
    gp[0][2], rp[0][2] = gA01, rA01
    gp[2][0], rp[2][0] = gA10, rA10
    gp[2][2], rp[2][2] = gA11, rA11
    for a in (0, 1):
        for b in (0, 1):
            Pab = preds[(a, b)]
            sh = Pab.shape
            # q01: pixels (4i+2a, 4j+2b+1); q10: (4i+2a+1, 4j+2b); q11: both+1.
            gp[2 * a][2 * b + 1], rp[2 * a][2 * b + 1] = _code(
                D[2 * a][2 * b + 1], Pab, quantize,
                maskf(sh, 2 * a * sy, 4 * sy, (2 * b + 1) * sx, 4 * sx),
            )
            gp[2 * a + 1][2 * b], rp[2 * a + 1][2 * b] = _code(
                D[2 * a + 1][2 * b], Pab, quantize,
                maskf(sh, (2 * a + 1) * sy, 4 * sy, 2 * b * sx, 4 * sx),
            )
            gp[2 * a + 1][2 * b + 1], rp[2 * a + 1][2 * b + 1] = _code(
                D[2 * a + 1][2 * b + 1], Pab, quantize,
                maskf(sh, (2 * a + 1) * sy, 4 * sy, (2 * b + 1) * sx, 4 * sx),
            )
    return gp, (None if lossless else rp), subinfo


def _encode_arr(X, lrem, quantize, tree, maskf, sy, sx):
    """Encode a materialized (m, n) lattice; returns (grid, recon) arrays."""
    lossless = quantize is None
    if lrem == 0:
        return X, X
    if lrem == 1:
        p4 = _planes_k(X, 2)
        C = p4[0][0]
        trs = _shift_lane(C)
        P = tree(C, trs, _shift_sub(C), _shift_sub(trs))
        sh = P.shape
        g01, r01 = _code(p4[0][1], P, quantize, maskf(sh, 0, 2 * sy, sx, 2 * sx))
        g10, r10 = _code(p4[1][0], P, quantize, maskf(sh, sy, 2 * sy, 0, 2 * sx))
        g11, r11 = _code(p4[1][1], P, quantize, maskf(sh, sy, 2 * sy, sx, 2 * sx))
        G = _assemble([[C, g01], [g10, g11]])
        R = X if lossless else _assemble([[C, r01], [r10, r11]])
        return G, R
    gp, rp, _ = _encode_core(_planes_k(X, 4), lrem, quantize, tree, maskf, sy, sx)
    return _assemble(gp), (X if rp is None else _assemble(rp))


# -- subband emission ---------------------------------------------------------
#
# The kernel's per-level planes ARE the subband decomposition; emission
# only has to put them in the pyramid.encode_subbands byte layout without
# lane relayouts.  Two forms cover every level:
#
# * ``("pairs", q)`` — the FINEST level of each recursion depth.  A quad
#   like q01 alternates two column-residue planes byte-for-byte
#   (cols 2c+1: residue 1 then 3), so each u16 of its row-major bytes is
#   ``A | B << 8`` — pure elementwise — and rows interleave the two
#   row-residue planes with one sublane stack.  ``q`` is that int32
#   array (values < 2**16); the host truncates to u16 and bitcasts.
# * ``("vals", q)`` — level-A quads / anchors / odd-tail quads are single
#   stride-4 planes already in row-major order; ``q`` holds one byte
#   value per element (host truncates to u8).  Coarse levels only —
#   <= 1/4 of the data — so the 2-byte output costs nothing measurable.


def _crop_plane(p, rows):
    """Crop a plane's sublane dim to its final emission rows.

    Cropping BEFORE the pair/stack packing matters on TPU: with the
    bottom halo attached, plane row counts are 8-misaligned (e.g. 17 =
    (256+16)/16), and Mosaic lowers the (m, 2, n) -> (2m, n) interleave
    reshape on misaligned sublanes through a scalar fallback (~100us of
    a 360us 1080p-x8 kernel, measured).  The tile's own rows are a
    multiple of ``8 << levels``, so every cropped shape is aligned.
    """
    return p if rows is None or p.shape[-2] <= rows else p[..., :rows, :]


def _pair(A0, B0, A2, B2, rows=None):
    """Pair-pack a finest-level quad: (rows r even: A0|B0<<8; odd: A2|B2<<8)."""
    u0 = _crop_plane(A0 | (B0 << 8), rows)
    u2 = _crop_plane(A2 | (B2 << 8), rows)
    st = jnp.stack([u0, u2], axis=-2)  # [..., m, 2, n]
    return st.reshape(*u0.shape[:-2], 2 * u0.shape[-2], u0.shape[-1])


def _sub_levels_from_gp(gp, rq=None):
    """(level_A_entry, level_B_entry) from a 4x4 grid-plane list.

    ``rq`` crops every plane to its final emission rows first (see
    :func:`_crop_plane`).
    """
    level_a = (
        "vals",
        (
            _crop_plane(gp[0][2], rq),
            _crop_plane(gp[2][0], rq),
            _crop_plane(gp[2][2], rq),
        ),
    )
    level_b = (
        "pairs",
        (
            _pair(gp[0][1], gp[0][3], gp[2][1], gp[2][3], rq),  # q01: (2r, 2c+1)
            _pair(gp[1][0], gp[1][2], gp[3][0], gp[3][2], rq),  # q10: (2r+1, 2c)
            _pair(gp[1][1], gp[1][3], gp[3][1], gp[3][3], rq),  # q11: (2r+1, 2c+1)
        ),
    )
    return level_a, level_b


def _sub_arr(X, lrem, quantize, tree, maskf, sy, sx, emit_rows=None):
    """Subband-encode a materialized lattice.

    Returns ``(anchor_plane, levels_list, recon)`` — levels coarsest
    first, ``recon`` the assembled reconstruction lattice the PARENT
    level predicts from (== X when lossless).  ``emit_rows`` is the
    tile's own valid row count at this lattice's scale (None in
    interpret/whole-array mode): emission outputs are cropped to it
    eagerly so the packing reshapes see 8-aligned sublane counts.
    """
    lossless = quantize is None
    if lrem == 0:
        return _crop_plane(X, emit_rows), [], X
    if lrem == 1:
        p4 = _planes_k(X, 2)
        C = p4[0][0]
        trs = _shift_lane(C)
        P = tree(C, trs, _shift_sub(C), _shift_sub(trs))
        sh = P.shape
        g01, r01 = _code(p4[0][1], P, quantize, maskf(sh, 0, 2 * sy, sx, 2 * sx))
        g10, r10 = _code(p4[1][0], P, quantize, maskf(sh, sy, 2 * sy, 0, 2 * sx))
        g11, r11 = _code(p4[1][1], P, quantize, maskf(sh, sy, 2 * sy, sx, 2 * sx))
        R = X if lossless else _assemble([[C, r01], [r10, r11]])
        rq = None if emit_rows is None else emit_rows >> 1
        return (
            _crop_plane(C, rq),
            [("vals", (_crop_plane(g01, rq), _crop_plane(g10, rq),
                       _crop_plane(g11, rq)))],
            R,
        )
    gp, rp, (anc, levels_sub) = _encode_core(
        _planes_k(X, 4), lrem, quantize, tree, maskf, sy, sx, sub=True,
        emit_rows=emit_rows,
    )
    level_a, level_b = _sub_levels_from_gp(
        gp, None if emit_rows is None else emit_rows >> 2
    )
    recon = X if rp is None else _assemble(rp)
    return anc, levels_sub + [level_a, level_b], recon


def _bytes16_from_u32(xw: jnp.ndarray, valid=None):
    """uint32 (r, wc) canvas words -> 16 stride-4 planes (_PT), elementwise.

    ``valid`` (padless input path): zero the planes at canvas rows >=
    ``valid``.  When the true image height is not a canvas/tile multiple
    the kernel reads past the array end (Pallas pads out-of-bounds block
    reads with unspecified bytes); masking restores exactly the
    zero-padded-canvas semantics.  The mask is FREE: the extraction
    already ANDs each byte with 255, so the scalar 255 becomes a
    per-row (m, 1) vector that is 255 where ``4*i + ry < valid`` (<=>
    ``i < (valid - ry + 3) >> 2``; the arithmetic shift floors negatives,
    masking everything) and 0 elsewhere — four (m, 1) selects replace
    the sixteen full-plane iota+where chains that used to cost ~90us of
    a 226us 1080p-x8 encode.
    """
    r, wc = xw.shape
    r4 = xw.reshape(r // 4, 4, wc)
    rows = [r4[:, ry, :] for ry in range(4)]
    if valid is None:
        m255 = [_U32(255)] * 4
    else:
        i = _iota((r // 4, 1), 0)
        m255 = [
            jnp.where(i < ((valid - ry + 3) >> 2), _U32(255), _U32(0))
            for ry in range(4)
        ]
    return [
        [((rows[ry] >> _U32(8 * rx)) & m255[ry]).astype(_PT) for rx in range(4)]
        for ry in range(4)
    ]


def _pack_u32(planes, mq: int) -> jnp.ndarray:
    """16 byte planes -> uint32 grid words (4*mq rows), elementwise."""
    words = []
    for ry in range(4):
        w = (
            planes[ry][0][:mq].astype(_U32)
            | (planes[ry][1][:mq].astype(_U32) << _U32(8))
            | (planes[ry][2][:mq].astype(_U32) << _U32(16))
            | (planes[ry][3][:mq].astype(_U32) << _U32(24))
        )
        words.append(w)
    stacked = jnp.stack(words, axis=1)  # (mq, 4, wc)
    return stacked.reshape(stacked.shape[0] * 4, stacked.shape[2])


def _encode_tile(xw, levels, quantize, tree, maskf, out_rows, want_recon,
                 valid=None):
    global _CACHE
    _CACHE = {}
    try:
        D = _bytes16_from_u32(xw, valid)
        gp, rp, _ = _encode_core(D, levels, quantize, tree, maskf, 1, 1)
        grid = _pack_u32(gp, out_rows // 4)
        recon = (
            _pack_u32(rp, out_rows // 4)
            if (want_recon and rp is not None)
            else None
        )
        return grid, recon
    finally:
        _CACHE = None


def _crop_rows(x, rows):
    """Drop halo-derived trailing rows (static slice on the sublane dim)."""
    return x[..., :rows, :] if x.shape[-2] != rows else x


def _encode_sub_tile(xw, levels, quantize, tree, maskf, out_rows, want_recon,
                     valid=None):
    """Subband-emitting tile body: -> (anchor, flat quad list, recon|None).

    Quads come out as u16 arrays in the two emission forms (see the
    subband-emission note above); every array is cropped to the tile's
    own rows (halo rows computed redundantly are dropped, exactly like
    the grid path's out_rows crop).
    """
    global _CACHE
    _CACHE = {}
    try:
        D = _bytes16_from_u32(xw, valid)
        gp, rp, (anc, levels_sub) = _encode_core(
            D, levels, quantize, tree, maskf, 1, 1, sub=True,
            emit_rows=out_rows,
        )
        level_a, level_b = _sub_levels_from_gp(gp, out_rows >> 2)
        entries = levels_sub + [level_a, level_b]
        outs = [_crop_rows(anc, out_rows >> levels).astype(jnp.uint16)]
        for lv, (kind, quads) in enumerate(entries):
            scale = levels - lv  # quad rows = tile rows >> scale
            for q in quads:
                outs.append(
                    _crop_rows(q, out_rows >> scale).astype(jnp.uint16)
                )
        recon = (
            _pack_u32(rp, out_rows // 4)
            if (want_recon and rp is not None)
            else None
        )
        return outs, recon
    finally:
        _CACHE = None


# -- decode -----------------------------------------------------------------


def _dec(res, pred, mask):
    r = (pred + res) & 255
    if mask is not None:
        r = jnp.where(mask, r, 0)
    return r


def _decode_core(Dg, lrem, tree, maskf, sy, sx):
    """Mirror of :func:`_encode_core`: grid planes -> recon planes."""
    if lrem == 2:
        S = Dg[0][0]  # anchors are stored raw
    else:
        S = _decode_arr(Dg[0][0], lrem - 2, tree, maskf, 4 * sy, 4 * sx)
    trs = _shift_lane(S)
    P = tree(S, trs, _shift_sub(S), _shift_sub(trs))
    sh = P.shape
    rA01 = _dec(Dg[0][2], P, maskf(sh, 0, 4 * sy, 2 * sx, 4 * sx))
    rA10 = _dec(Dg[2][0], P, maskf(sh, 2 * sy, 4 * sy, 0, 4 * sx))
    rA11 = _dec(Dg[2][2], P, maskf(sh, 2 * sy, 4 * sy, 2 * sx, 4 * sx))

    c00, c01, c10, c11 = S, rA01, rA10, rA11
    sl00 = _shift_lane(c00)
    sl10 = _shift_lane(c10)
    ss00 = _shift_sub(c00)
    ss01 = _shift_sub(c01)
    preds = {
        (0, 0): tree(c00, c01, c10, c11),
        (0, 1): tree(c01, sl00, c11, sl10),
        (1, 0): tree(c10, c11, ss00, ss01),
        (1, 1): tree(c11, sl10, ss01, _shift_sub(sl00)),
    }
    rp = [[None] * 4 for _ in range(4)]
    rp[0][0], rp[0][2], rp[2][0], rp[2][2] = S, rA01, rA10, rA11
    for a in (0, 1):
        for b in (0, 1):
            Pab = preds[(a, b)]
            sh = Pab.shape
            rp[2 * a][2 * b + 1] = _dec(
                Dg[2 * a][2 * b + 1], Pab,
                maskf(sh, 2 * a * sy, 4 * sy, (2 * b + 1) * sx, 4 * sx),
            )
            rp[2 * a + 1][2 * b] = _dec(
                Dg[2 * a + 1][2 * b], Pab,
                maskf(sh, (2 * a + 1) * sy, 4 * sy, 2 * b * sx, 4 * sx),
            )
            rp[2 * a + 1][2 * b + 1] = _dec(
                Dg[2 * a + 1][2 * b + 1], Pab,
                maskf(sh, (2 * a + 1) * sy, 4 * sy, (2 * b + 1) * sx, 4 * sx),
            )
    return rp


def _decode_arr(G, lrem, tree, maskf, sy, sx):
    if lrem == 0:
        return G
    if lrem == 1:
        p4 = _planes_k(G, 2)
        C = p4[0][0]
        trs = _shift_lane(C)
        P = tree(C, trs, _shift_sub(C), _shift_sub(trs))
        sh = P.shape
        r01 = _dec(p4[0][1], P, maskf(sh, 0, 2 * sy, sx, 2 * sx))
        r10 = _dec(p4[1][0], P, maskf(sh, sy, 2 * sy, 0, 2 * sx))
        r11 = _dec(p4[1][1], P, maskf(sh, sy, 2 * sy, sx, 2 * sx))
        return _assemble([[C, r01], [r10, r11]])
    rp = _decode_core(_planes_k(G, 4), lrem, tree, maskf, sy, sx)
    return _assemble(rp)


def _decode_tile(gw, levels, tree, maskf, out_rows, valid=None):
    global _CACHE
    _CACHE = {}
    try:
        Dg = _bytes16_from_u32(gw, valid)
        rp = _decode_core(Dg, levels, tree, maskf, 1, 1)
        return _pack_u32(rp, out_rows // 4)
    finally:
        _CACHE = None


# -- host wrappers ----------------------------------------------------------


def _plan(h: int, w: int, levels: int, halo_mult: int, tile_rows=None):
    """Static tile plan: (hp_t, wp, wc, th, halo, n_tiles).

    The tile height is a multiple of the halo (so the halo block of tile
    ``t`` is an aligned block of the padded input) and never larger than
    the padded canvas needs.
    """
    step = 1 << levels
    hp = cdiv(h, step) * step
    wp = cdiv(w, step) * step
    # A larger halo is always safe (superset of the required rows); the
    # minimum of 8 keeps halo blocks sublane-aligned for Mosaic.
    halo = max(halo_mult * step, 8)
    if tile_rows:
        th = max(halo, cdiv(min(tile_rows, hp), halo) * halo)
    else:
        # Pick the tile height that minimizes redundant work: padded
        # rows (hp_t - hp) plus redundant halo reads (hp_t * halo / th).
        # Measured on v5e: ~128-row tiles pipeline best; large tiles
        # lose VMEM locality, tiny ones drown in halo re-reads.  Deep
        # levels force large halos (2^L rows), so the candidate range
        # extends to 3*halo — at levels>=7 a tile of only 2*_BASE_TILE
        # spends 50% of its rows on halo (the r3 artifact's "L7 cliff":
        # 10.3 -> 12.7 GPix/s measured at th=384 on ikonos L7).  The
        # VMEM guard drops candidates whose plane working set cannot
        # fit (~16 MB of Mosaic scoped VMEM; th=768 at L8 fails to
        # compile without it).
        best, th = None, halo
        for cand in range(halo, max(2 * _BASE_TILE, 3 * halo) + 1, halo):
            if (cand + halo) * wp * 8 > 16_000_000:
                continue
            hp_c = cdiv(hp, cand) * cand
            cost = (hp_c - hp) + hp_c * halo / cand + abs(cand - _BASE_TILE) / 8
            if best is None or cost < best:
                best, th = cost, cand
    hp_t = cdiv(hp, th) * th
    return hp_t, wp, wp // 4, th, halo, hp_t // th


def _to_words(x: jnp.ndarray, rows: int, wp: int) -> jnp.ndarray:
    """Zero-pad a uint8 (n, h, w) stack to (n, rows, wp) and view as u32."""
    n, h, w = x.shape
    x = jnp.pad(x, ((0, 0), (0, rows - h), (0, wp - w)))
    return lax.bitcast_convert_type(x.reshape(n, rows, wp // 4, 4), _U32)


def _from_words(xw: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    n, rows, wc = xw.shape
    x = lax.bitcast_convert_type(xw[..., None], _U8).reshape(n, rows, wc * 4)
    return x[:, :h, :w]


def supported(levels: int, h: int, w: int, quantize, predictor: str) -> bool:
    """Whether the fused kernel covers this configuration.

    Outside it (levels < 2 after clamping, very wide canvases, LUT/table
    quantizers) callers use the XLA path — same bits, different engine.
    """
    lv = effective_levels(levels, h, w)
    if lv < 2:
        return False
    if cdiv(w, 1 << lv) * (1 << lv) > _MAX_WIDTH:
        return False
    if predictor not in _TREES:
        return False
    if quantize is None:
        return True
    if isinstance(quantize, (LinearQuantizer, NoOpQuantizer)):
        return True
    return bool(getattr(quantize, "identity", False))


def _norm_quantize(quantize):
    """None (statically lossless) or a LinearQuantizer for the kernel."""
    if quantize is None or getattr(quantize, "identity", False):
        return None
    if isinstance(quantize, LinearQuantizer):
        return None if quantize.error == 0 else quantize
    raise ValueError(f"unsupported quantizer for the Pallas path: {quantize!r}")


def _pair_specs(th, halo, wc):
    """(main, halo) BlockSpecs — one image per grid step.

    Blocks keep a batch dim of exactly 1: out-of-bounds row reads (the
    padless path) are only safe when the valid data is a contiguous
    prefix of the block, which a >1 batch dim breaks (reproduced fault
    of the v5e worker process at 1080p x8).
    """
    return [
        pl.BlockSpec(
            (1, th, wc), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, halo, wc),
            lambda b, t, m=th // halo: (b, (t + 1) * m, 0),
            memory_space=pltpu.VMEM,
        ),
    ]


def _out_spec(th, wc):
    return pl.BlockSpec(
        (1, th, wc), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )


@partial(
    jax.jit,
    static_argnames=("levels", "error", "predictor", "want_recon", "tile_rows"),
)
def _encode_batch(image, levels, error, predictor, want_recon, tile_rows):
    n, h, w = image.shape
    levels = effective_levels(levels, h, w)
    quantize = None if error is None else LinearQuantizer(error)
    lossless = quantize is None
    hp_t, wp, wc, th, halo, n_tiles = _plan(
        h, w, levels, 1 if lossless else 2, tile_rows
    )
    # Padless fast path: when the width is already canvas-aligned, skip
    # the XLA zero-pad pass (a full extra HBM round trip) — the kernel
    # reads past the array end (unspecified bytes) and re-establishes
    # the zero-canvas semantics by masking rows >= h in VMEM.
    padless = (wp == w) and h < hp_t + halo and not _interpret()
    if padless:
        xw = lax.bitcast_convert_type(image.reshape(n, h, wc, 4), _U32)
    else:
        xw = _to_words(image, hp_t + halo, wp)
    tree = _TREES[predictor]

    emit_recon = want_recon and not lossless

    def kernel(main_ref, halo_ref, out_ref, *rest):
        t = pl.program_id(1) if n_tiles > 1 else 0
        x = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)
        maskf = (
            _NO_MASK
            if lossless
            else _Masks(h, w, hp_t + halo, wp, t * th)
        )
        grid, recon = _encode_tile(
            x, levels, quantize, tree, maskf, th, emit_recon,
            valid=(h - t * th) if padless else None,
        )
        out_ref[0] = grid
        if emit_recon:
            rest[0][0] = recon

    vma = _vma(image)
    out_shapes = [jax.ShapeDtypeStruct((n, hp_t, wc), _U32, vma=vma)]
    out_specs = [_out_spec(th, wc)]
    if emit_recon:
        out_shapes.append(jax.ShapeDtypeStruct((n, hp_t, wc), _U32, vma=vma))
        out_specs.append(_out_spec(th, wc))
    results = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=_pair_specs(th, halo, wc),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(xw, xw)
    grid = _from_words(results[0], h, w)
    if not want_recon:
        return grid, None
    recon = image if lossless else _from_words(results[1], h, w)
    return grid, recon


def _sub_layout(levels: int, wp: int):
    """Static output layout of the subband kernel.

    Returns ``[(kind, scale, width_elems)]`` coarsest level first, where
    quad rows = canvas rows >> scale.  Mirrors the recursion in
    :func:`_encode_core`/:func:`_sub_arr` exactly.
    """
    kinds = []
    lrem = levels
    while lrem >= 2:
        kinds = [("vals",), ("pairs",)] + kinds  # prepend deeper levels
        lrem -= 2
    if lrem == 1:
        kinds = [("vals",)] + kinds
    out = []
    for l, (kind,) in enumerate(kinds):
        scale = levels - l
        wq = wp >> scale
        out.append((kind, scale, wq if kind == "vals" else wq // 2))
    return out


def _sub_plan(h, w, levels, halo_mult, tile_rows):
    """Tile plan for the subband-emitting kernel.

    Mosaic requires output block rows divisible by 8 (or the full array);
    the coarsest output's block rows are ``th >> levels``, so ``th`` must
    be a multiple of ``8 << levels`` (a multiple of every halo this
    kernel uses).  The tile height is the quantum itself: measured on
    v5e at 1080p x8 lossless, th=128 runs 333 us vs 465/459 us at
    th=256/384 — the 13-output kernel's VMEM working set loses pipelining
    long before the generic cost model's padding/halo terms notice, so
    no cost model: smallest legal tile wins (the halo is a fixed
    fraction of the quantum regardless).
    """
    quantum = 8 << levels
    if tile_rows is not None:
        rounded = cdiv(tile_rows, quantum) * quantum
        return _plan(h, w, levels, halo_mult, rounded)
    return _plan(h, w, levels, halo_mult, quantum)


def supported_subbands(levels: int, h: int, w: int, quantize, predictor) -> bool:
    """Whether the subband-emitting kernel covers this configuration.

    :func:`supported` plus a VMEM bound: the forced ``8 << levels`` tile
    quantum makes deep-level tiles tall, and Mosaic's scoped VMEM is
    ~16 MB (measured OOM at th=1088 on a 1920-wide canvas).
    """
    if not supported(levels, h, w, quantize, predictor):
        return False
    lv = effective_levels(levels, h, w)
    lossless = quantize is None or getattr(quantize, "identity", False) or (
        getattr(quantize, "error", None) == 0
    )
    hp_t, wp, wc, th, halo, n_tiles = _sub_plan(
        h, w, lv, 1 if lossless else 2, None
    )
    return (th + halo) * wc * 4 * 8 <= 14_000_000


# One output buffer per LEVEL (the 3 quads stacked on a size-3 dim)
# instead of 3 separate outputs: 13 output streams -> 5 for levels=4.
# MEASURED SLOWER on v5e (chip_probe sbreduce r5: coalesced 47.5 vs
# 49.4 GPix/s median for the 13-output form, which also had the
# tightest spread of any row at 2.3%) — Mosaic handles many small
# output windows better than strided 4D blocks.  Kept toggleable for
# re-measurement on future toolchains; default OFF.
_SB_COALESCE_DEFAULT = False


@partial(
    jax.jit,
    static_argnames=(
        "levels", "error", "predictor", "want_recon", "tile_rows", "coalesce"
    ),
)
def _encode_sub_batch(image, levels, error, predictor, want_recon, tile_rows,
                      coalesce=_SB_COALESCE_DEFAULT):
    n, h, w = image.shape
    levels = effective_levels(levels, h, w)
    quantize = None if error is None else LinearQuantizer(error)
    lossless = quantize is None
    hp_t, wp, wc, th, halo, n_tiles = _sub_plan(
        h, w, levels, 1 if lossless else 2, tile_rows
    )
    padless = (wp == w) and h < hp_t + halo and not _interpret()
    if padless:
        xw = lax.bitcast_convert_type(image.reshape(n, h, wc, 4), _U32)
    else:
        xw = _to_words(image, hp_t + halo, wp)
    tree = _TREES[predictor]
    emit_recon = want_recon and not lossless
    layout = _sub_layout(levels, wp)

    def kernel(main_ref, halo_ref, *out_refs):
        t = pl.program_id(1) if n_tiles > 1 else 0
        x = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)
        maskf = (
            _NO_MASK
            if lossless
            else _Masks(h, w, hp_t + halo, wp, t * th)
        )
        outs, recon = _encode_sub_tile(
            x, levels, quantize, tree, maskf, th, emit_recon,
            valid=(h - t * th) if padless else None,
        )
        out_refs[0][0] = outs[0]  # anchors
        if coalesce:
            for lv in range(len(layout)):
                ref = out_refs[1 + lv]
                for j in range(3):
                    ref[0, j] = outs[1 + 3 * lv + j]
            next_ref = 1 + len(layout)
        else:
            for k, val in enumerate(outs[1:]):
                out_refs[1 + k][0] = val
            next_ref = 1 + 3 * len(layout)
        if emit_recon:
            out_refs[next_ref][0] = recon

    vma = _vma(image)

    def spec(scale, width):
        return (
            jax.ShapeDtypeStruct((n, hp_t >> scale, width), jnp.uint16,
                                 vma=vma),
            pl.BlockSpec(
                (1, th >> scale, width), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
        )

    def spec_level(scale, width):
        return (
            jax.ShapeDtypeStruct((n, 3, hp_t >> scale, width), jnp.uint16,
                                 vma=vma),
            pl.BlockSpec(
                (1, 3, th >> scale, width), lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        )

    out_shapes, out_specs = [], []
    sh, sp = spec(levels, wp >> levels)  # anchors
    out_shapes.append(sh)
    out_specs.append(sp)
    for kind, scale, width in layout:
        if coalesce:
            sh, sp = spec_level(scale, width)
            out_shapes.append(sh)
            out_specs.append(sp)
        else:
            for _ in range(3):
                sh, sp = spec(scale, width)
                out_shapes.append(sh)
                out_specs.append(sp)
    if emit_recon:
        out_shapes.append(jax.ShapeDtypeStruct((n, hp_t, wc), _U32, vma=vma))
        out_specs.append(_out_spec(th, wc))
    results = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=_pair_specs(th, halo, wc),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(xw, xw)

    hp = cdiv(h, 1 << levels) * (1 << levels)

    def to_bytes(x, kind, scale):
        x = x[:, : hp >> scale]  # drop canvas-beyond-hp tile padding rows
        if kind == "vals":
            return x.astype(_U8)
        u8 = lax.bitcast_convert_type(x[..., None], _U8)
        return u8.reshape(*x.shape[:-1], 2 * x.shape[-1])

    anchors = to_bytes(results[0], "vals", levels)
    subbands = []
    if coalesce:
        for i, (kind, scale, width) in enumerate(layout):
            r = results[1 + i]  # [n, 3, rows, width]
            subbands.append(
                tuple(to_bytes(r[:, j], kind, scale) for j in range(3))
            )
    else:
        i = 1
        for kind, scale, width in layout:
            subbands.append(
                tuple(to_bytes(results[i + j], kind, scale) for j in range(3))
            )
            i += 3
    if not want_recon:
        return anchors, subbands, None
    if lossless:
        return anchors, subbands, image
    return anchors, subbands, _from_words(results[-1], h, w)


@partial(jax.jit, static_argnames=("levels", "predictor", "tile_rows"))
def _decode_batch(grid, levels, predictor, tile_rows):
    n, h, w = grid.shape
    levels = effective_levels(levels, h, w)
    hp_t, wp, wc, th, halo, n_tiles = _plan(h, w, levels, 2, tile_rows)
    padless = (wp == w) and h < hp_t + halo and not _interpret()
    if padless:
        gw = lax.bitcast_convert_type(grid.reshape(n, h, wc, 4), _U32)
    else:
        gw = _to_words(grid, hp_t + halo, wp)
    tree = _TREES[predictor]

    def kernel(main_ref, halo_ref, out_ref):
        t = pl.program_id(1) if n_tiles > 1 else 0
        g = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)
        maskf = _Masks(h, w, hp_t + halo, wp, t * th)
        out_ref[0] = _decode_tile(
            g, levels, tree, maskf, th,
            valid=(h - t * th) if padless else None,
        )

    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=_pair_specs(th, halo, wc),
        out_specs=_out_spec(th, wc),
        out_shape=jax.ShapeDtypeStruct((n, hp_t, wc), _U32, vma=_vma(grid)),
        interpret=_interpret(),
    )(gw, gw)
    return _from_words(out, h, w)


def encode_plane_pallas(
    image: jnp.ndarray,
    levels: int,
    quantize=None,
    predictor: str = "crossed",
    want_recon: bool = True,
    tile_rows: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused-kernel counterpart of ops.pyramid.encode_plane.

    Returns ``(grid, recon)`` — both uint8 [..., H, W], bit-identical to
    the XLA path and the oracle.  ``quantize`` must be None / identity /
    a LinearQuantizer (see :func:`supported`).  ``tile_rows`` overrides
    the row-tile height (tests force multi-tile on small images).
    """
    image = jnp.asarray(image, _U8)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    q = _norm_quantize(quantize)
    grid, recon = _encode_batch(
        image, int(levels), (None if q is None else q.error), predictor,
        want_recon, tile_rows,
    )
    if squeeze:
        grid = grid[0]
        recon = None if recon is None else recon[0]
    return grid, recon


def encode_subbands_pallas(
    image: jnp.ndarray,
    levels: int,
    quantize=None,
    predictor: str = "crossed",
    want_recon: bool = True,
    tile_rows: Optional[int] = None,
    coalesce: bool = _SB_COALESCE_DEFAULT,
):
    """Fused-kernel counterpart of ops.pyramid.encode_subbands.

    Returns ``(anchors, subbands, recon)`` bit-identical to the XLA path
    (canvas-padded shapes; ``subbands[l]`` = (q01, q10, q11), coarsest
    level first).  The kernel's internal per-level planes ARE the
    subband decomposition, so emission costs only elementwise u16
    packing — no grid interleave, no host re-split.  Coverage matches
    :func:`supported`.
    """
    image = jnp.asarray(image, _U8)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    q = _norm_quantize(quantize)
    anchors, subbands, recon = _encode_sub_batch(
        image, int(levels), (None if q is None else q.error), predictor,
        want_recon, tile_rows, coalesce,
    )
    if squeeze:
        anchors = anchors[0]
        subbands = [tuple(x[0] for x in quads) for quads in subbands]
        recon = None if recon is None else recon[0]
    return anchors, subbands, recon


def decode_plane_pallas(
    grid: jnp.ndarray,
    levels: int,
    predictor: str = "crossed",
    tile_rows: Optional[int] = None,
) -> jnp.ndarray:
    """Fused-kernel counterpart of ops.pyramid.decode_plane."""
    grid = jnp.asarray(grid, _U8)
    squeeze = grid.ndim == 2
    if squeeze:
        grid = grid[None]
    out = _decode_batch(grid, int(levels), predictor, tile_rows)
    return out[0] if squeeze else out


# -- subband-direct decode ---------------------------------------------------
#
# Mirrors the encode-side subband EMISSION in reverse: a no-halo,
# mask-free Pallas kernel repacks the subband quads into row-major grid
# words (pure layout — the inverse of _encode_sub_tile's packing, all
# elementwise u16 arithmetic plus the depth>=1 _assemble interleaves the
# encode kernel uses anyway), and the battle-tested grid decode kernel
# reconstructs.  This beats a direct halo-tiled subband decoder: the
# reconstruction halo is 2^(L+1) canvas rows but the coarsest subband
# input block would force a uniform 8*2^L-row halo (Mosaic's 8-row block
# floor cascaded through the plane alignment of every interleave), i.e.
# 25-50% redundant compute per tile — versus one extra HBM round trip of
# the plane (~2 passes at ~40 us for a 1080p x8 batch) for the repack.


_PAIR_SLOTS = (
    ((0, 1), (0, 3), (2, 1), (2, 3)),  # q01: (2r, 2c+1)
    ((1, 0), (1, 2), (3, 0), (3, 2)),  # q10: (2r+1, 2c)
    ((1, 1), (1, 3), (3, 1), (3, 3)),  # q11: (2r+1, 2c+1)
)


def _unsub_gp(anchor, entries, lrem):
    """4x4 grid-plane list of the top lattice (lrem >= 2) — inverse of
    :func:`_sub_levels_from_gp` + recursion, no cropping (no-halo tiles
    are exact)."""
    (_, pairs_b) = entries[-1]
    (_, vals_a) = entries[-2]
    gp = [[None] * 4 for _ in range(4)]
    gp[0][0] = _unsub_arr(anchor, entries[:-2], lrem - 2)
    gp[0][2], gp[2][0], gp[2][2] = vals_a
    for q, slots in zip(pairs_b, _PAIR_SLOTS):
        m2, n = q.shape
        st = q.reshape(m2 // 2, 2, n)
        u0, u2 = st[:, 0, :], st[:, 1, :]
        for (ry, rx), plane in zip(
            slots, (u0 & 255, u0 >> 8, u2 & 255, u2 >> 8)
        ):
            gp[ry][rx] = plane
    return gp


def _unsub_arr(anchor, entries, lrem):
    """Grid lattice from (anchor plane, emission entries) — inverse of
    :func:`_sub_arr`."""
    if lrem == 0:
        return anchor
    if lrem == 1:
        (_, (g01, g10, g11)) = entries[-1]
        return _assemble([[anchor, g01], [g10, g11]])
    return _assemble(_unsub_gp(anchor, entries, lrem))


def _unsub_tile(anchor, flat_quads, layout, levels, out_rows):
    """Tile body of the repack kernel: emission arrays -> grid u32 words.

    levels < 2 never reaches this kernel (the supported() gate routes
    them to the XLA path), so the top lattice always has a 4x4 plane
    decomposition and packs straight to u32 words.
    """
    global _CACHE
    _CACHE = {}
    try:
        entries = []
        i = 0
        for kind, scale, width in layout:
            entries.append((kind, tuple(
                flat_quads[i + j].astype(_PT) for j in range(3)
            )))
            i += 3
        gp = _unsub_gp(anchor.astype(_PT), entries, levels)
        return _pack_u32(gp, out_rows // 4)
    finally:
        _CACHE = None


def _unsub_plan(hp: int, wp: int, levels: int, tile_rows=None):
    """No-halo tile plan for the repack kernel: (hp_t, th, n_tiles).

    Tile rows must be a multiple of the 8<<levels quantum (the coarsest
    input's block rows stay 8-aligned); the cost model only trades
    padding rows against the ~128-row pipelining sweet spot, with the
    VMEM guard of the subband kernels.
    """
    quantum = 8 << levels
    if tile_rows is not None:
        th = cdiv(tile_rows, quantum) * quantum
    else:
        best, th = None, quantum
        for cand in range(quantum, 4 * quantum + 1, quantum):
            if cand * wp * 8 > 14_000_000:
                continue
            hp_c = cdiv(hp, cand) * cand
            cost = (hp_c - hp) + abs(cand - _BASE_TILE) / 8
            if best is None or cost < best:
                best, th = cost, cand
            if cand >= hp:
                break
    hp_t = cdiv(hp, th) * th
    return hp_t, th, hp_t // th


def _repack_words(anchors, flat_quads, levels, h, w, tile_rows):
    """Repack kernel -> (u32 words [n, hp_t, wc], th).  Traced helper."""
    n = anchors.shape[0]
    step = 1 << levels
    hp = cdiv(h, step) * step
    wp = cdiv(w, step) * step
    layout = _sub_layout(levels, wp)
    hp_t, th, n_tiles = _unsub_plan(hp, wp, levels, tile_rows)
    wc = wp // 4

    # Convert API quads (uint8, canvas shapes) to the kernel-native u16
    # emission forms (inverse of _encode_sub_batch's to_bytes) and pad
    # rows to the tile plan.  Pure elementwise/bitcast XLA, outside the
    # kernel — exactly mirroring the encode side, where the same
    # conversions run host-graph-side after the kernel.
    def to_u16(x, kind, scale):
        rows = hp_t >> scale
        if kind == "vals":
            x = x.astype(jnp.uint16)
        else:
            m, k2 = x.shape[-2:]
            x = lax.bitcast_convert_type(
                x.reshape(*x.shape[:-2], m, k2 // 2, 2), jnp.uint16
            )
        if x.shape[-2] != rows:
            x = jnp.pad(x, ((0, 0), (0, rows - x.shape[-2]), (0, 0)))
        return x

    anc16 = to_u16(anchors, "vals", levels)
    quads16 = []
    i = 0
    for kind, scale, width in layout:
        for j in range(3):
            quads16.append(to_u16(flat_quads[i + j], kind, scale))
        i += 3

    def spec(scale, width):
        return pl.BlockSpec(
            (1, th >> scale, width), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [spec(levels, wp >> levels)]
    for kind, scale, width in layout:
        in_specs += [spec(scale, width)] * 3

    def kernel(anc_ref, *refs):
        quad_vals = [r[0] for r in refs[:-1]]
        out_ref = refs[-1]
        out_ref[0] = _unsub_tile(anc_ref[0], quad_vals, layout, levels, th)

    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=in_specs,
        out_specs=_out_spec(th, wc),
        out_shape=jax.ShapeDtypeStruct((n, hp_t, wc), _U32,
                                       vma=_vma(anchors)),
        interpret=_interpret(),
    )(anc16, *quads16)
    return out, th


@partial(jax.jit, static_argnames=("levels", "h", "w", "tile_rows"))
def _assemble_grid_batch(anchors, flat_quads, levels, h, w, tile_rows):
    out, _ = _repack_words(anchors, flat_quads, levels, h, w, tile_rows)
    return _from_words(out, h, w)


@partial(
    jax.jit, static_argnames=("levels", "predictor", "h", "w", "tile_rows")
)
def _decode_sub_batch(anchors, flat_quads, levels, predictor, h, w, tile_rows):
    """Fused subband decode: repack words feed the decode kernel directly.

    The intermediate residual grid stays in u32 word form between the
    two pallas_calls — no uint8 materialization, no crop copy (going
    through the public assemble/decode pair costs ~150 us of extra HBM
    round trips per 1080p x8 batch, measured).  The repack's padding
    rows are exact zeros (inputs are zero-padded), reproducing the
    zero-canvas contract; the decode kernel's ``valid`` masking covers
    the rows its last tile reads past the buffer end.
    """
    gw, th = _repack_words(anchors, flat_quads, levels, h, w, tile_rows)
    n = gw.shape[0]
    hp_t, wp, wc, th_d, halo, n_tiles = _plan(h, w, levels, 2, th)
    # Same th => same hp_t; the decode halo blocks of the last tile read
    # past gw's end (unspecified bytes), which `valid` masking squashes —
    # except in interpret mode, where OOB block reads are errors.
    if _interpret():
        gw = jnp.pad(gw, ((0, 0), (0, halo), (0, 0)))
    tree = _TREES[predictor]

    def kernel(main_ref, halo_ref, out_ref):
        t = pl.program_id(1) if n_tiles > 1 else 0
        g = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)
        maskf = _Masks(h, w, hp_t + halo, wp, t * th_d)
        out_ref[0] = _decode_tile(
            g, levels, tree, maskf, th_d, valid=h - t * th_d,
        )

    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=_pair_specs(th_d, halo, wc),
        out_specs=_out_spec(th_d, wc),
        out_shape=jax.ShapeDtypeStruct((n, hp_t, wc), _U32, vma=_vma(gw)),
        interpret=_interpret(),
    )(gw, gw)
    return _from_words(out, h, w)


def assemble_grid_pallas(
    anchors, subbands, shape, levels: int, tile_rows: Optional[int] = None
):
    """Pallas counterpart of ops.pyramid.assemble_grid.

    Subband quads (uint8, canvas shapes, coarsest level first — the
    layout of encode_subbands / the .thgi subband container) -> the
    row-major residual grid plane, bit-identical to the XLA assemble.
    One no-halo elementwise kernel; no prediction math.
    """
    anchors = jnp.asarray(anchors, _U8)
    squeeze = anchors.ndim == 2
    if squeeze:
        anchors = anchors[None]
        subbands = [tuple(q[None] for q in quads) for quads in subbands]
    flat = [jnp.asarray(q, _U8) for quads in subbands for q in quads]
    h, w = shape
    out = _assemble_grid_batch(
        anchors, tuple(flat), effective_levels(int(levels), h, w), h, w,
        tile_rows,
    )
    return out[0] if squeeze else out


def decode_subbands_pallas(
    anchors,
    subbands,
    shape,
    levels: int,
    predictor: str = "crossed",
    tile_rows: Optional[int] = None,
) -> jnp.ndarray:
    """Subband-direct decode: repack kernel + fused grid decode kernel.

    Bit-identical to ops.pyramid.decode_subbands (decoder parity,
    reference src/decoder.rs:18-46).  The residual grid exists only as
    u32 words between the two kernels — see :func:`_decode_sub_batch`.
    """
    anchors = jnp.asarray(anchors, _U8)
    squeeze = anchors.ndim == 2
    if squeeze:
        anchors = anchors[None]
        subbands = [tuple(q[None] for q in quads) for quads in subbands]
    flat = tuple(jnp.asarray(q, _U8) for quads in subbands for q in quads)
    h, w = shape
    out = _decode_sub_batch(
        anchors, flat, effective_levels(int(levels), h, w), predictor,
        h, w, tile_rows,
    )
    return out[0] if squeeze else out
