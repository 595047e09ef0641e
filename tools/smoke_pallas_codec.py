import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
from rustyhgi_tpu.oracle import oracle_encode, oracle_decode
from rustyhgi_tpu.ops.pallas_codec import encode_plane_pallas, decode_plane_pallas
from rustyhgi_tpu.ops.quantizers import QuantizationLevel, quantize_fn, linear_error
from rustyhgi_tpu.ops import pyramid

rng = np.random.default_rng(0)
fails = 0
for (h, w) in [(64, 64), (37, 53), (128, 96), (300, 260)]:
    for levels in [2, 3, 4, 5]:
        for preset in [QuantizationLevel.LOSSLESS, QuantizationLevel.MEDIUM]:
            for pred in ["crossed", "left_top"]:
                img = rng.integers(0, 256, (h, w), np.uint8)
                q = quantize_fn(preset)
                go = oracle_encode(img, levels, preset, pred)
                gp, rp = encode_plane_pallas(img, levels, q, pred, tile_rows=64)
                ok_g = np.array_equal(np.asarray(gp), go)
                do = oracle_decode(go, levels, pred)
                dp = decode_plane_pallas(go, levels, pred, tile_rows=64)
                ok_d = np.array_equal(np.asarray(dp), do)
                ok_r = rp is None or np.array_equal(np.asarray(rp), do)
                if not (ok_g and ok_d and ok_r):
                    fails += 1
                    print(f"MISMATCH h={h} w={w} L={levels} {preset.name} {pred}: grid={ok_g} dec={ok_d} recon={ok_r}")
                    if fails > 3:
                        raise SystemExit(1)
print("smoke done, fails =", fails)
