"""Multi-host (pod-slice) drive loop.

The reference has no distributed tier at all (SURVEY.md §2); this module is
the designed-from-scratch N-host driver for gigapixel tiled streams
(SURVEY.md §7 step 6):

* ``jax.distributed.initialize`` once per process; the global (data, tile)
  mesh spans all hosts, so intra-slice collectives ride ICI and only the
  final variable-length block gather crosses DCN — and that gather is
  host-side (compressed blocks have data-dependent lengths, which an SPMD
  device program cannot ship — SURVEY.md §7 hard part (c)).
* Tiles are assigned by global index: host h owns tiles
  ``[h*B/N, (h+1)*B/N)`` in the deterministic row-major tile order of
  ``tile_plane``, so the gathered archive order is reproducible for any
  host count.
* Shared coder tables: ``parallel.sharded.sharded_histogram`` psums the
  residual histogram over the whole mesh and
  ``ops.entropy.rans_encode(..., freqs=normalized_freqs(hist))`` encodes
  every block with the identical broadcast table (see
  tests/test_native.py::test_shared_freq_table); the default per-block
  tables are self-contained archives.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops.quantizers import QuantizationLevel
from ..utils.container import Archive, Interpolation, Metadata, write_archive

__all__ = ["MultiHostConfig", "initialize", "encode_tiled_multihost"]


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


def encode_tiled_multihost(
    plane: np.ndarray,
    tile: Tuple[int, int],
    levels: int,
    quantization: QuantizationLevel,
    fmt: str = "thgi",
    mesh_shape: Optional[Tuple[int, int]] = None,
) -> Optional[List[bytes]]:
    """Encode a large plane as tiled independent streams across all hosts.

    Every process computes its local shard on its local devices; process 0
    returns the compressed blocks for ALL tiles in deterministic row-major
    tile order (other processes return None).  Single-process calls simply
    use all local devices.
    """
    import jax

    from .mesh import make_mesh
    from .sharded import encode_batch_sharded, pad_batch, tile_plane

    tiles, shape = tile_plane(plane, tile)
    n_tiles = tiles.shape[0]
    mesh = make_mesh(mesh_shape)
    n_dev = mesh.devices.size
    padded, n_pad = pad_batch(tiles, n_dev)

    grids, _, _ = encode_batch_sharded(padded, levels, quantization, mesh=mesh)
    # Deterministic ordered gather: pull the batch in global index order.
    # Multi-process global arrays span non-addressable devices, so the
    # gather is an explicit DCN allgather (shards concatenate in sharding
    # order -> batch order is preserved); single-process arrays are a
    # plain device->host copy.
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        grids_host = np.asarray(
            multihost_utils.process_allgather(grids, tiled=True)
        )[:n_tiles]
    else:
        grids_host = np.asarray(jax.device_get(grids))[:n_tiles]

    if jax.process_index() != 0:
        return None

    th, tw = tile
    blocks: List[bytes] = []
    for i in range(n_tiles):
        meta = Metadata(quantization, Interpolation.CROSSED, tw, th, levels)
        blocks.append(write_archive(Archive(meta, grids_host[i]), fmt))
    return blocks
