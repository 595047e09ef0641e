"""True multi-process distributed test.

Spawns two OS processes that jax.distributed-initialize against each other
(CPU backend, 4 virtual devices each -> 8 global), run the tiled
multi-host encode, gather blocks over the coordinator transport, and
verify the lossless roundtrip on process 0.  This exercises the actual
cross-process path (global arrays spanning non-addressable devices, DCN
allgather) that single-process tests cannot.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id, nprocs, port, repo = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, repo)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    import numpy as np
    from rustyhgi_tpu.parallel.multihost import encode_tiled_multihost
    from rustyhgi_tpu.ops.quantizers import QuantizationLevel

    rng = np.random.default_rng(0)
    plane = rng.integers(0, 256, (64, 64), np.uint8)

    # Broadcast coder tables: the psum'd global histogram must yield the
    # identical rANS table (and identical compressed bytes for the same
    # block) on EVERY process — the cross-host determinism the multi-host
    # coder relies on.
    from rustyhgi_tpu.parallel.mesh import make_mesh
    from rustyhgi_tpu.parallel.sharded import (
        encode_batch_sharded, pad_batch, tile_plane,
    )
    from rustyhgi_tpu.ops.entropy import normalized_freqs, rans_encode

    tiles, _ = tile_plane(plane, (16, 16))
    mesh = make_mesh()
    padded, _ = pad_batch(tiles, mesh.devices.size)
    _, _, hist = encode_batch_sharded(
        padded, 3, QuantizationLevel.LOSSLESS, mesh=mesh, with_histogram=True
    )
    table = normalized_freqs(np.asarray(hist))
    shared_blob = rans_encode(tiles[0].tobytes(), table)
    digest = __import__("hashlib").sha256(
        table.tobytes() + shared_blob
    ).hexdigest()
    print(f"TABLE_DIGEST {digest}", flush=True)

    blocks = encode_tiled_multihost(
        plane, (16, 16), 3, QuantizationLevel.LOSSLESS, fmt="hgi"
    )
    if proc_id == 0:
        assert blocks is not None and len(blocks) == 16
        from rustyhgi_tpu.utils.container import read_archive
        from rustyhgi_tpu.parallel.sharded import untile_plane
        from rustyhgi_tpu.models.codec import HGICodec

        tiles = np.stack([read_archive(b).grid for b in blocks])
        dec = np.asarray(HGICodec(3).decode_plane(tiles))
        assert np.array_equal(untile_plane(dec, (64, 64)), plane)
        print("MULTIHOST_OK", flush=True)
    else:
        assert blocks is None
        print("WORKER_OK", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_tiled_encode(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = str(_free_port())
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port, repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    assert "MULTIHOST_OK" in outs[0]
    assert "WORKER_OK" in outs[1]
    # Both processes derived the identical shared coder table and produced
    # identical compressed bytes from it.
    digests = [
        line.split()[1]
        for out in outs
        for line in out.splitlines()
        if line.startswith("TABLE_DIGEST")
    ]
    assert len(digests) == 2 and digests[0] == digests[1]
