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


def _fbm(shape, octaves, rng, persistence=0.55):
    """Cheap fractal value noise via upsampled random grids."""
    h, w = shape
    out = np.zeros(shape, np.float32)
    amp = 1.0
    for o in range(octaves):
        gh, gw = max(2, h >> (octaves - 1 - o)), max(2, w >> (octaves - 1 - o))
        g = rng.standard_normal((gh, gw)).astype(np.float32)
        ys = np.linspace(0, gh - 1, h)
        xs = np.linspace(0, gw - 1, w)
        y0 = np.clip(ys.astype(int), 0, gh - 2)
        x0 = np.clip(xs.astype(int), 0, gw - 2)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        v = (g[y0][:, x0] * (1 - fy) * (1 - fx)
             + g[y0 + 1][:, x0] * fy * (1 - fx)
             + g[y0][:, x0 + 1] * (1 - fy) * fx
             + g[y0 + 1][:, x0 + 1] * fy * fx)
        out += amp * v
        amp *= persistence
    return out


def synth_hdri(h=2048, w=4096, seed=11):
    """Procedural equirect HDRI with urban_alley-class dynamic range."""
    rng = np.random.default_rng(seed)
    theta = (np.arange(h) + 0.5) / h * np.pi               # 0..pi from +Y
    phi = (np.arange(w) + 0.5) / w * 2 * np.pi
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    y = np.cos(tt)                                          # up component

    # Sky gradient: zenith blue -> horizon warm glow:
    zen = np.clip(y, 0, 1)[..., None]
    sky = (np.array([0.18, 0.32, 0.75]) * (0.4 + 0.6 * zen)
           + np.array([0.9, 0.55, 0.25]) * np.exp(-np.abs(y)[..., None] * 6.0))
    # Clouds:
    clouds = np.clip(_fbm((h, w), 7, rng) * 0.5 + 0.2, 0, 2.0)
    sky += (clouds * np.clip(y, 0, 1))[..., None] * np.array([0.8, 0.8, 0.85])

    # Sun disc + halo:
    sun_dir = np.array([np.sin(1.1) * np.cos(0.7), np.cos(1.1),
                        np.sin(1.1) * np.sin(0.7)])
    dirs = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                     np.sin(tt) * np.sin(pp)], axis=-1)
    cosang = np.clip(dirs @ sun_dir, -1, 1)
    sun = np.exp((cosang - 1.0) * 8000.0) * 1500.0
    halo = np.exp((cosang - 1.0) * 40.0) * 6.0
    sky += (sun + halo)[..., None] * np.array([1.0, 0.9, 0.75])

    # Ground: textured warm grey with low-frequency variation:
    ground_tex = 0.25 + 0.12 * _fbm((h, w), 6, rng)
    ground = np.clip(ground_tex, 0.02, 0.6)[..., None] * np.array(
        [0.45, 0.4, 0.36])
    img = np.where((y < 0)[..., None], ground, sky)
    return np.clip(img, 1e-5, 2000.0).astype(np.float32)


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
