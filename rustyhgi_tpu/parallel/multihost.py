"""Multi-host (pod-slice) drive loops: truly distributed encode + decode.

The reference has no distributed tier at all (SURVEY.md §2); this module is
the designed-from-scratch N-host driver for gigapixel tiled streams
(SURVEY.md §7 step 6).  Design:

* ``jax.distributed.initialize`` once per process; the global (data, tile)
  mesh spans all hosts, so the pyramid compute and the coder-table psum
  ride ICI.
* **Entropy coding is local**: every process pulls only its own devices'
  residual shards (no cross-host traffic), entropy-codes those tiles on
  its own host cores, and the only DCN exchange is an allgather of the
  *compressed* variable-length blocks — traffic per process is
  ``n_proc * max_process_payload ~= compressed size``, not ``W*H`` raw
  bytes.  The gather is host-side because compressed lengths are
  data-dependent, which an SPMD device program cannot ship (SURVEY.md §7
  hard part (c)).
* Tiles are assigned by the mesh sharding of the batch axis in the
  deterministic row-major order of ``tile_plane``; the gathered archive is
  byte-identical for ANY process count because each block's bytes depend
  only on its tile content (and the shared table, which is a global psum).
* Shared coder tables: ``with shared_table=True`` the residual histogram
  is psum'd over the whole mesh, every process derives the identical
  normalized rANS table, and blocks are written table-stripped
  (``write_thgi(..., freqs=...)``); the table is stored once in the tiled
  container (``utils.container.thgit2_header``).
* Failure detection: per-tile entropy encode retries once (idempotent
  work), every block crosses DCN with a CRC32 that is verified after the
  gather, and missing/corrupt tiles raise structured errors naming the
  tile indices.
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops.quantizers import QuantizationLevel
from ..utils.container import (
    Archive,
    Metadata,
    read_archive,
    thgit2_block_frame,
    thgit2_header,
    write_archive,
)

__all__ = [
    "MultiHostConfig",
    "TiledEncodeResult",
    "initialize",
    "encode_tiled_multihost",
    "decode_tiled_multihost",
    "write_thgit_multihost",
]


@dataclasses.dataclass
class MultiHostConfig:
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


def initialize(config: MultiHostConfig = MultiHostConfig()) -> None:
    """Initialize jax.distributed (no-op for single-process runs)."""
    import jax

    if config.num_processes is None or config.num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=config.coordinator_address,
        num_processes=config.num_processes,
        process_id=config.process_id,
    )


@dataclasses.dataclass
class TiledEncodeResult:
    """Result of a distributed tiled encode (identical on every process).

    ``blocks``: all per-tile archives, row-major tile order.
    ``freqs``: the shared rANS table (None unless shared_table=True).
    ``local_indices``: tiles entropy-coded by THIS process (disjoint
    across processes, union = all tiles).
    ``dcn_payload_bytes``: bytes each process shipped over DCN in the
    block gather (0 for single-process runs) — assert this stays at
    compressed scale, never raw W*H.
    ``shape``: the original (H, W) for ``untile_plane``.
    """

    blocks: List[bytes]
    freqs: Optional[np.ndarray]
    local_indices: List[int]
    dcn_payload_bytes: int
    shape: Tuple[int, int]

    @property
    def compressed_bytes(self) -> int:
        return sum(len(b) for b in self.blocks)


class TileCodingError(RuntimeError):
    """A tile failed to encode/verify; ``indices`` names the tiles."""

    def __init__(self, msg: str, indices: Sequence[int]):
        super().__init__(f"{msg}: tiles {list(indices)[:16]}")
        self.indices = list(indices)


def _local_batch_slices(arr) -> List[Tuple[int, int, np.ndarray]]:
    """(start, stop, host_data) for each addressable shard's batch slice."""
    out = []
    for shard in arr.addressable_shards:
        sl = shard.index[0]
        start = 0 if sl.start is None else int(sl.start)
        stop = arr.shape[0] if sl.stop is None else int(sl.stop)
        out.append((start, stop, np.asarray(shard.data)))
    return out


def _gather_blocks(
    local: List[Tuple[int, bytes]], n_tiles: int
) -> Tuple[List[bytes], int]:
    """Allgather variable-length compressed blocks across processes.

    ``local`` is this process's (global_tile_index, block_bytes) list.
    Every process returns the complete ordered block list.  Each entry
    crosses DCN framed as u32 index, u64 length, u32 CRC32, bytes; CRCs
    are verified after the gather (transport integrity), and missing or
    duplicate tiles raise :class:`TileCodingError`.

    Returns ``(blocks, dcn_payload_bytes)`` where the payload size is
    what this process shipped (the padded per-process buffer) — at
    compressed scale by construction, since only coded blocks cross DCN.
    """
    import jax

    got = {}
    corrupt = []
    dups: List[Tuple[int, int]] = []  # (process, tile): assignment bugs
    if jax.process_count() == 1:
        got = dict(local)
        dcn = 0
    else:
        from jax.experimental import multihost_utils

        payload = b"".join(
            struct.pack("<IQI", i, len(b), zlib.crc32(b)) + b
            for i, b in local
        )
        n = np.array([len(payload)], np.int64)
        lens = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
        maxlen = max(int(lens.max()), 1)
        buf = np.zeros(maxlen, np.uint8)
        if payload:
            buf[: len(payload)] = np.frombuffer(payload, np.uint8)
        rows = np.asarray(multihost_utils.process_allgather(buf))
        dcn = maxlen
        for p in range(rows.shape[0]):
            row = rows[p].tobytes()[: int(lens[p])]
            off = 0
            while off + 16 <= len(row):
                i, blen, crc = struct.unpack_from("<IQI", row, off)
                off += 16
                block = row[off : off + blen]
                off += blen
                if len(block) != blen or zlib.crc32(block) != crc:
                    corrupt.append(i)
                    continue
                if i in got:
                    # NOT transport corruption: two processes claimed the
                    # same tile.  Report it as the driver/assignment bug
                    # it is, so diagnosis isn't misdirected at DCN.
                    dups.append((p, i))
                    continue
                got[i] = block
    if dups:
        procs = sorted({p for p, _ in dups})
        raise TileCodingError(
            f"duplicate tile assignment (driver bug) from processes {procs}",
            sorted({i for _, i in dups}),
        )
    if corrupt:
        raise TileCodingError("corrupt blocks after DCN gather", corrupt)
    missing = [i for i in range(n_tiles) if i not in got]
    if missing:
        raise TileCodingError("tiles missing after gather", missing)
    return [got[i] for i in range(n_tiles)], dcn


def _encode_one_block(
    meta: Metadata, grid: np.ndarray, fmt: str, freqs, retries: int = 1
) -> bytes:
    """Entropy-code one tile with retry (idempotent host work)."""
    last = None
    for _ in range(retries + 1):
        try:
            return write_archive(
                Archive(meta, grid), fmt,
                freqs=freqs if fmt == "thgi" else None,
            )
        except Exception as e:  # transient coder/backend failure
            last = e
    raise last


def encode_tiled_multihost(
    plane: np.ndarray,
    tile: Tuple[int, int],
    levels: int,
    quantization: QuantizationLevel,
    fmt: str = "thgi",
    mesh_shape: Optional[Tuple[int, int]] = None,
    shared_table: bool = False,
    predictor: str = "crossed",
) -> TiledEncodeResult:
    """Encode a large plane as tiled independent streams across all hosts.

    Every process computes its local shard on its local devices and
    entropy-codes ONLY those tiles on its own host; compressed blocks are
    allgathered so every process returns the identical
    :class:`TiledEncodeResult` (deterministic for any process count).
    Single-process calls use all local devices with zero DCN traffic.

    ``shared_table=True`` psums the global residual histogram on device,
    derives one rANS table on every process (bit-identical —
    ops.entropy.normalized_freqs mirrors native/rans.cpp), and codes all
    blocks against it table-stripped; persist with
    :func:`write_thgit_multihost` which stores the table once.
    """
    from .mesh import make_mesh
    from .sharded import encode_batch_sharded, pad_batch, tile_plane
    from ..ops.entropy import normalized_freqs
    from ..ops.predictors import predictor_tag

    import jax

    tiles, shape = tile_plane(plane, tile)
    n_tiles = tiles.shape[0]
    mesh = make_mesh(mesh_shape)
    padded, _ = pad_batch(tiles, mesh.devices.size)

    grids, _, _ = encode_batch_sharded(
        padded, levels, quantization, mesh=mesh, predictor=predictor,
    )
    slices = _local_batch_slices(grids)

    freqs = None
    if shared_table:
        # Global residual histogram over REAL tiles only (zero-pad tiles
        # excluded, so the table is invariant to mesh/process count).
        # Counted host-side from the shards each process already pulls
        # for entropy coding; the cross-host sum is 2 KB of DCN.
        counts = np.zeros(256, np.int64)
        for start, stop, data in slices:
            n_real = min(stop, n_tiles) - start
            if n_real > 0:
                counts += np.bincount(
                    data[:n_real].reshape(-1), minlength=256
                )
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            counts = np.asarray(
                multihost_utils.process_allgather(counts)
            ).sum(axis=0)
        freqs = normalized_freqs(counts)

    th, tw = tile
    meta = Metadata(quantization, predictor_tag(predictor), tw, th, levels)
    local: List[Tuple[int, bytes]] = []
    for start, stop, data in slices:
        for j in range(data.shape[0]):
            gi = start + j
            if gi >= n_tiles:
                continue  # batch padding, not a real tile
            local.append((gi, _encode_one_block(meta, data[j], fmt, freqs)))

    blocks, dcn = _gather_blocks(local, n_tiles)
    return TiledEncodeResult(
        blocks=blocks,
        freqs=freqs,
        local_indices=sorted(i for i, _ in local),
        dcn_payload_bytes=dcn,
        shape=shape,
    )


def decode_tiled_multihost(
    blocks: Sequence[bytes],
    shape: Tuple[int, int],
    tile: Tuple[int, int],
    freqs: Optional[np.ndarray] = None,
    mesh_shape: Optional[Tuple[int, int]] = None,
    gather: bool = True,
) -> Optional[np.ndarray]:
    """Distributed decode of a tiled archive (mirror of the encode driver).

    Every process entropy-decodes ONLY the blocks its devices will
    reconstruct (host-local, no DCN), uploads them as its shards of the
    global residual batch, and the pyramid decode runs sharded over the
    whole mesh.  With ``gather=True`` the decoded pixels are allgathered
    and every process returns the full [H, W] plane (the output itself,
    so raw-size DCN here is inherent, not overhead); ``gather=False``
    returns None and callers consume local shards via their own paths.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import DATA_AXIS, TILE_AXIS, make_mesh
    from .sharded import decode_batch_sharded, untile_plane
    from ..ops.predictors import predictor_name_for_tag

    th, tw = tile
    h, w = shape
    n_tiles = (-(-h // th)) * (-(-w // tw))
    if len(blocks) != n_tiles:
        raise TileCodingError(
            "block count does not cover the plane",
            range(len(blocks), n_tiles),
        )
    mesh = make_mesh(mesh_shape)
    n_dev = mesh.devices.size
    B = -(-n_tiles // n_dev) * n_dev
    sharding = NamedSharding(mesh, P((DATA_AXIS, TILE_AXIS)))
    global_shape = (B, th, tw)

    # (levels, interp) come from block 0: every process holds the FULL
    # block list, so every process compiles the identical collective
    # program even when its own mesh shards contain only batch-padding
    # slots (n_tiles < global device count) — learning metadata only from
    # locally-owned blocks would make such a process raise while its
    # peers enter the collective, a cross-process hang.  Blocks with
    # mismatching metadata are rejected below (one archive = one program).
    try:
        head = read_archive(bytes(blocks[0]), freqs=freqs)
    except Exception:
        raise TileCodingError("undecodable blocks", [0])
    levels = head.metadata.scale_level
    interp = head.metadata.interpolation

    arrays = []
    bad: List[int] = []
    mismatched: List[int] = []
    for dev, idx in sharding.addressable_devices_indices_map(
        global_shape
    ).items():
        sl = idx[0]
        start = 0 if sl.start is None else int(sl.start)
        stop = B if sl.stop is None else int(sl.stop)
        chunk = np.zeros((stop - start, th, tw), np.uint8)
        for j, gi in enumerate(range(start, min(stop, n_tiles))):
            try:
                archive = read_archive(bytes(blocks[gi]), freqs=freqs)
            except Exception:
                bad.append(gi)
                continue
            if archive.grid.shape != (th, tw):
                bad.append(gi)
                continue
            if (
                archive.metadata.scale_level != levels
                or archive.metadata.interpolation != interp
            ):
                mismatched.append(gi)
                continue
            chunk[j] = archive.grid
        arrays.append(jax.device_put(chunk, dev))
    if bad:
        raise TileCodingError("undecodable blocks", bad)
    if mismatched:
        raise TileCodingError(
            "blocks disagree with block 0's (levels, interpolation) metadata",
            mismatched,
        )
    grids = jax.make_array_from_single_device_arrays(
        global_shape, sharding, arrays
    )
    # The decode honors the archives' interpolation tag (reference
    # main.rs:67 hardcodes Crossed — a bug this framework fixes).
    decoded = decode_batch_sharded(
        grids, int(levels), mesh=mesh,
        predictor=predictor_name_for_tag(int(interp)),
    )
    if not gather:
        return None
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        tiles_host = np.asarray(
            multihost_utils.process_allgather(decoded, tiled=True)
        )[:n_tiles]
    else:
        tiles_host = np.asarray(jax.device_get(decoded))[:n_tiles]
    return untile_plane(tiles_host, shape)


def write_thgit_multihost(result: TiledEncodeResult, tile: int) -> bytes:
    """Serialize a :class:`TiledEncodeResult` as a .thgit v2 container.

    The shared rANS table (if any) is stored ONCE in the header; every
    block is CRC32-framed.  Identical bytes on every process.
    """
    h, w = result.shape
    out = [thgit2_header(tile, w, h, len(result.blocks), result.freqs)]
    out.extend(thgit2_block_frame(b) for b in result.blocks)
    return b"".join(out)
