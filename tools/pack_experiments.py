"""Size experiments for the device pack (CPU, NumPy models).

Models several TPU-implementable pack schemes on REAL residual planes and
compares payload size against host rANS — picking the design for the
write_fast device entropy stage (VERDICT r2 #4: device payload must be
<= 1.2x host-rANS on LENA/fullhd residuals).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from rustyhgi_tpu.models.codec import HGICodec
from rustyhgi_tpu.ops.entropy import rans_encode
from rustyhgi_tpu.ops.quantizers import linear_error
from rustyhgi_tpu.utils.imageio import load_luma


def zigzag(v):
    v = v.astype(np.int64)
    return np.where(v < 128, v * 2, (256 - v) * 2 - 1)


def scale_symbols(g, error):
    """Residual byte -> small symbol index, exploiting lossy quantization.

    Quantized residuals are multiples of scale=2e+1 (mod 256); map back to
    the signed multiplier k and zigzag it.  Lossless (scale=1) reduces to
    plain zigzag.
    """
    scale = 2 * error + 1
    v = g.astype(np.int64)
    signed = np.where(v < 128, v, v - 256)
    k = signed // scale
    rem = signed - k * scale
    # exactness check: the overflow-fixup path stores RAW diffs, which are
    # NOT multiples of scale -> those bytes need an escape
    exact = rem == 0
    zz = np.where(k >= 0, 2 * k, -2 * k - 1)
    return zz, exact


def bits_needed(m):
    return np.ceil(np.log2(np.maximum(m, 1) + 1)).astype(np.int64)


def width_pack_size(z, block):
    """Per-block max-width pack: width nibble/byte + width*block bits."""
    n = z.size
    nb = -(-n // block)
    zz = np.zeros(nb * block, np.int64)
    zz[:n] = z.reshape(-1)
    zz = zz.reshape(nb, block)
    w = bits_needed(zz.max(axis=1))
    return int((w * block).sum()) / 8 + nb * 0.5  # 4-bit widths


def sig_plus_width(z, block):
    """1-bit significance plane + per-block width over (z-1) of nonzeros."""
    n = z.size
    sig_bits = n  # 1 bpp
    nz = z[z > 0] - 1
    if nz.size == 0:
        return sig_bits / 8
    nb = -(-nz.size // block)
    pad = np.zeros(nb * block, np.int64)
    pad[: nz.size] = nz
    w = bits_needed(pad.reshape(nb, block).max(axis=1))
    return sig_bits / 8 + int((w * block).sum()) / 8 + nb * 0.5


def two_level(z, big=1024, small=8):
    """Per-small-column width, width nibbles packed; zero-cost via nibble."""
    n = z.size
    z = z.reshape(-1)
    n = z.size
    nb = -(-n // small)
    pad = np.zeros(nb * small, np.int64)
    pad[:n] = z
    w = bits_needed(pad.reshape(nb, small).max(axis=1))
    return int((w * small).sum()) / 8 + nb * 0.5


def entropy_bits(z):
    c = np.bincount(z.reshape(-1).astype(np.int64))
    p = c[c > 0] / z.size
    return float(-(p * np.log2(p)).sum()) * z.size / 8


def report(name, g, error):
    raw = g.size
    rans = len(rans_encode(g.tobytes()))
    zz = zigzag(g)
    zs, exact = scale_symbols(g, error)
    frac_escape = 1.0 - exact.mean()
    # escapes coded as raw 8-bit in a side stream + 1 sig bit idea; just
    # approximate: treat non-exact as max symbol (widens blocks)
    zs_full = np.where(exact, zs, zs.max() + 1 if zs.size else 0)
    rows = {
        "rans": rans,
        "blk1024": width_pack_size(zz, 1024),
        "blk128": width_pack_size(zz, 128),
        "blk32": width_pack_size(zz, 32),
        "col8": two_level(zz, small=8),
        "sig+blk32": sig_plus_width(zz, 32),
        "s_blk32": width_pack_size(zs_full, 32) if error else None,
        "s_col8": two_level(zs_full, small=8) if error else None,
        "s_sig+blk32": sig_plus_width(zs_full, 32) if error else None,
        "H0(zz)": entropy_bits(zz),
        "H0(s)": entropy_bits(zs_full) if error else None,
    }
    print(f"\n{name}: raw {raw} B, escapes {frac_escape*100:.2f}%")
    for k, v in rows.items():
        if v is None:
            continue
        print(f"  {k:>12}: {int(v):>8} B  ({v / rans:.2f}x rANS)")


def main():
    imgs = {
        "LENA": load_luma("/root/reference/res/LENA.TIF"),
        "fullhd": load_luma("/root/reference/res/fullhd.jpg"),
    }
    for name, img in imgs.items():
        for quality in ("lossless", "low", "medium", "high"):
            codec = HGICodec(4, quality, backend="xla")
            g = np.asarray(codec.encode_plane(img)[0])
            report(f"{name}/{quality}", g, linear_error(codec.quantization))


if __name__ == "__main__":
    main()
