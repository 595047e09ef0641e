"""Command-line interface.

Mirrors the reference CLI surface (reference: src/options.rs:13-65,
src/main.rs:41-128): ``encode``/``decode``/``test`` subcommands with
``-i/-o/-l/-q/-s`` flags, same defaults (level=4, quantizator=medium,
case-insensitive), plus TPU-framework extras: ``--format hgi|thgi``,
``--backend jax|oracle|native``, and a ``bench`` subcommand.

Usage::

    python -m rustyhgi_tpu encode -i in.png -o out.hgi -l 4 -q medium
    python -m rustyhgi_tpu decode -i out.hgi -o roundtrip.png
    python -m rustyhgi_tpu test res/LENA.TIF -l 4 -q lossless
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .models.codec import HGICodec
from .ops.quantizers import QuantizationLevel
from .utils.container import Archive, read_archive, write_archive
from .utils.imageio import load_luma, save_gray


def _add_encoding_options(p: argparse.ArgumentParser) -> None:
    # Defaults per options.rs:55-64.
    p.add_argument("-l", "--level", type=int, default=4, help="pyramid depth")
    p.add_argument(
        "-q",
        "--quantizator",
        type=str,
        default="medium",
        help="lossless|low|medium|high (case-insensitive)",
    )
    p.add_argument(
        "--backend",
        choices=("jax", "oracle", "native"),
        default="jax",
        help="compute backend (jax = TPU/XLA path)",
    )
    p.add_argument(
        "--format",
        choices=("hgi", "thgi"),
        default="hgi",
        help="container format (hgi = reference byte-compatible)",
    )


def _make_grid(image: np.ndarray, levels: int, quant, backend: str):
    if backend == "jax":
        grid, _ = HGICodec(levels, quant).encode_plane(image)
        return np.asarray(grid)
    if backend == "oracle":
        from .oracle import oracle_encode

        return oracle_encode(image, levels, quant)
    if backend == "native":
        from .ops.native import native_encode

        return native_encode(image, levels, quant)
    raise ValueError(backend)


def _decode_grid(grid: np.ndarray, levels: int, backend: str) -> np.ndarray:
    if backend == "jax":
        return np.asarray(HGICodec(levels).decode_plane(grid))
    if backend == "oracle":
        from .oracle import oracle_decode

        return oracle_decode(grid, levels)
    if backend == "native":
        from .ops.native import native_decode

        return native_decode(grid, levels)
    raise ValueError(backend)


def cmd_encode(args) -> int:
    quant = QuantizationLevel.parse(args.quantizator)
    image = load_luma(args.input)
    codec = HGICodec(args.level, quant)
    grid = _make_grid(image, args.level, quant, args.backend)
    archive = Archive(codec._metadata(*image.shape), grid)
    with open(args.output, "wb") as f:
        f.write(write_archive(archive, args.format))
    return 0


def cmd_decode(args) -> int:
    with open(args.input, "rb") as f:
        archive = read_archive(f.read())
    image = _decode_grid(
        archive.grid, archive.metadata.scale_level, args.backend
    )
    save_gray(args.output, image)
    return 0


def cmd_test(args) -> int:
    # Mirrors main.rs:73-120: roundtrip, print metrics, write .png + archive.
    quant = QuantizationLevel.parse(args.quantizator)
    image = load_luma(args.input)
    codec = HGICodec(args.level, quant)
    grid = _make_grid(image, args.level, quant, args.backend)
    decoded = _decode_grid(grid, args.level, args.backend)
    archive = Archive(codec._metadata(*image.shape), grid)
    blob = write_archive(archive, args.format)

    diff = image.astype(np.int64) - decoded.astype(np.int64)
    uncompressed = image.size
    sd = int((diff**2).sum()) // uncompressed  # integer mean, main.rs:106
    print(f"Uncompressed: {uncompressed // 1024} kb")
    print(f"Compressed:   {len(blob) // 1024} kb")
    print(f"Ratio:        {uncompressed / len(blob):.2f}")
    print(f"SD:           {float(sd) ** 0.5:.2f}")

    stem = os.path.splitext(os.path.basename(args.input))[0] + args.suffix
    save_gray(stem + ".png", decoded)
    ext = "." + args.format
    with open(stem + ext, "wb") as f:
        f.write(blob)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="rustyhgi_tpu",
        description="TPU-native hierarchical grid interpolation image codec",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("encode", help="compress an image to an archive")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    _add_encoding_options(p)
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("decode", help="decompress an archive to an image")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument(
        "--backend", choices=("jax", "oracle", "native"), default="jax"
    )
    p.set_defaults(fn=cmd_decode)

    p = sub.add_parser("test", help="roundtrip + metrics (reference parity)")
    p.add_argument("input")
    p.add_argument("-s", "--suffix", default="")
    _add_encoding_options(p)
    p.set_defaults(fn=cmd_test)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except Exception as e:  # main.rs:130-133 error surface
        print(f"An error occured: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
