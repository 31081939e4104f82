#!/usr/bin/env python
"""Train the reference-class NIF (6 x 320, embedding 12, fp16, log-tone
-mapped) on a 4k equirectangular HDRI, and ship it as an asset.

The reference's flagship neural-rendering demo uses urban_alley_01_4k
(2048 x 4096, 6 layers x 320 hidden, embedding dim 12, fp16 weights —
ref assets/nif/urban_alley_01_4k_fp16_yuv/nif_metadata.txt,
README.md:99) but ships no weights. This environment has no network
egress, so the HDRI here is synthesised procedurally at the same
resolution and dynamic range class: sun disc (~1e3 radiance), HDR sky
gradient with horizon glow, fBm cloud field, and a textured ground
hemisphere. The architecture, encoding and asset format match the
reference's exactly, so NIF benchmarks on this asset exercise the same
compute.

Usage:
  python examples/train_reference_nif.py [--steps 12000] [--out DIR]
Writes DIR/nif_metadata.txt + DIR/model.h5 (fp16), prints train loss and
reconstruction PSNR.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


from ipu_ray_lib_tpu.nif.synth import synth_hdri  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--height", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "assets", "nif",
        "synthetic_urban_4k"))
    args = ap.parse_args()

    from ipu_ray_lib_tpu.nif.train import save_nif_assets, train_nif

    img = synth_hdri(args.height, args.height * 2)
    print(f"HDRI {img.shape}, range [{img.min():.2g}, {img.max():.1f}]")

    t0 = time.time()
    model, meta = train_nif(
        img, embedding_dimension=12, layer_count=6, layer_size=320,
        steps=args.steps, batch_size=args.batch, learning_rate=1e-3,
        seed=4)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    # Reconstruction PSNR in the log-encoded domain (the quantity the
    # net fits; linear-HDR PSNR is dominated by the sun disc):
    rec = model.reconstruct_image(height=256, width=512)
    ref = img[::args.height // 256, ::args.height * 2 // 512]
    le_rec = np.log(np.clip(rec[..., ::-1], 1e-5, None))
    le_ref = np.log(np.clip(ref, 1e-5, None))
    mse = float(np.mean((le_rec - le_ref) ** 2))
    rng_ = float(le_ref.max() - le_ref.min())
    psnr = 10 * np.log10(rng_ * rng_ / mse)
    print(f"log-domain reconstruction PSNR: {psnr:.2f} dB (mse {mse:.4g})")

    meta.name = "synthetic_urban_4k"
    save_nif_assets(model, meta, args.out, fp16=True)
    print(f"assets written to {args.out}")


if __name__ == "__main__":
    main()
