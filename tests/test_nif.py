"""NIF subsystem tests: H5 round-trip, encode/decode parity vs numpy,
training convergence, and the escaped-ray environment-light wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipu_ray_lib_tpu.nif.hdf5 import load_keras_h5, save_keras_h5, NifWeights, DenseLayer
from ipu_ray_lib_tpu.nif.metadata import NifMetadata
from ipu_ray_lib_tpu.nif.model import (
    NifModel,
    direction_to_equirect_uv,
    load_nif_env,
)
from ipu_ray_lib_tpu.nif.train import make_nif, save_nif_assets, train_nif


def test_reference_metadata_parses():
    meta = NifMetadata.load(
        "assets/nif/urban_alley_01_4k_fp16_yuv/assets.extra/nif_metadata.txt"
    )
    assert meta.embedding_dimension == 12
    assert meta.hidden_size == 320
    assert meta.log_tone_map
    assert meta.image_shape == [2048, 4096, 3]
    # eps folded into the mean:
    assert meta.mean[0] == pytest.approx(-2.3514461517333984 - 1e-8)


def test_h5_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    layers = [
        DenseLayer("dense_0", "relu", rng.normal(size=(48, 32)).astype(np.float16),
                   rng.normal(size=32).astype(np.float16), "float16"),
        DenseLayer("dense_1", "linear", rng.normal(size=(80, 3)).astype(np.float16),
                   rng.normal(size=3).astype(np.float16), "float16"),
    ]
    path = str(tmp_path / "m.h5")
    save_keras_h5(path, NifWeights(layers=layers), embedding_dimension=12)
    loaded = load_keras_h5(path)
    assert len(loaded.layers) == 2
    np.testing.assert_array_equal(loaded.layers[0].kernel, layers[0].kernel)
    np.testing.assert_array_equal(loaded.layers[1].bias, layers[1].bias)
    assert loaded.layers[0].activation == "relu"
    assert loaded.layers[1].activation == "none"


def test_apply_matches_numpy():
    """The jitted MLP must equal a straightforward numpy evaluation —
    validates fourier encoding, skip concat, and decode."""
    key = jax.random.PRNGKey(3)
    model = make_nif(key, embedding_dimension=4, layer_count=3, layer_size=16)
    uv = np.random.default_rng(0).uniform(0, 1, (32, 2)).astype(np.float32)

    out = np.asarray(NifModel.apply(model.config, model.params, jnp.asarray(uv)))

    # numpy re-implementation:
    E = 4
    coeffs = 2.0 ** np.arange(E)
    uvn = 2.0 * (uv - 1.0)
    pu = uvn[:, :1] * coeffs
    pv = uvn[:, 1:2] * coeffs
    feats = np.concatenate([np.sin(pu), np.sin(pv), np.cos(pu), np.cos(pv)], axis=-1)
    x = feats
    for i, (k, b) in enumerate(zip(model.params["kernels"], model.params["biases"])):
        if model.config.concat_before[i]:
            x = np.concatenate([x, feats], axis=-1)
        x = x @ np.asarray(k) + np.asarray(b)
        if model.config.activations[i] == "relu":
            x = np.maximum(x, 0)
    x = x * float(model.params["max"]) + np.asarray(model.params["mean"])
    x = np.exp(x)
    np.testing.assert_allclose(out, x, rtol=2e-4, atol=2e-5)


def test_equirect_uv():
    dirs = np.array(
        [[0, 1, 0], [0, -1, 0], [1, 0, 0], [-1, 0, 0], [0, 0, 1]], np.float32
    )
    uv = np.asarray(direction_to_equirect_uv(jnp.asarray(dirs), 0.0))
    assert uv[0, 0] == pytest.approx(0.0, abs=1e-6)      # up
    assert uv[1, 0] == pytest.approx(1.0, abs=1e-6)      # down
    assert uv[2, 1] == pytest.approx(0.0, abs=1e-6)      # +x azimuth 0
    assert uv[3, 1] == pytest.approx(0.5, abs=1e-6)      # -x azimuth pi
    assert uv[4, 1] == pytest.approx(0.25, abs=1e-6)     # +z azimuth pi/2
    assert np.all((uv >= 0) & (uv <= 1))


def test_train_and_reload_small_nif(tmp_path):
    """Train a tiny NIF on a synthetic HDR gradient and verify both direct
    reconstruction and the assets round-trip through H5."""
    h, w = 16, 32
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack(
        [1.0 + np.sin(cc / w * 6.28), 0.5 + 0.5 * rr / h, 2.0 * cc / w], axis=-1
    ).astype(np.float32) + 0.05

    model, meta = train_nif(
        img, embedding_dimension=4, layer_count=3, layer_size=32,
        steps=600, batch_size=512, learning_rate=3e-3, seed=1,
    )
    recon_bgr = model.reconstruct_image(h, w)
    err = np.abs(recon_bgr[..., ::-1] - img).mean()
    assert err < 0.15, f"NIF training failed to fit: mean abs err {err}"

    out_dir = str(tmp_path / "nif_assets")
    save_nif_assets(model, meta, out_dir)
    env_fn, env_params = load_nif_env(out_dir, rotation_degrees=0.0)
    dirs = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb = np.asarray(env_fn(env_params, jnp.asarray(dirs)))
    assert rgb.shape == (64, 3)
    assert np.all(np.isfinite(rgb))
    assert np.all(rgb > 0)  # exp decode => positive radiance

    # The env lookup must agree with direct bilinear-free sampling of the
    # reconstructed image at the same uv (loose: fp16 weights + bf16 matmul):
    uv = np.asarray(direction_to_equirect_uv(jnp.asarray(dirs), 0.0))
    ri = np.clip((uv[:, 0] * h).astype(int), 0, h - 1)
    ci = np.clip((uv[:, 1] * w).astype(int), 0, w - 1)
    ref = recon_bgr[ri, ci][:, ::-1]
    assert np.median(np.abs(rgb - ref) / (ref + 0.1)) < 0.35


def test_path_trace_with_env_light(tmp_path):
    """Spheres scene + trained NIF env: escaped rays must pick up light."""
    from ipu_ray_lib_tpu.render.renderer import render
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_primitive_scene

    img = np.full((8, 16, 3), 0.8, np.float32)
    model, meta = train_nif(
        img, embedding_dimension=2, layer_count=2, layer_size=8,
        steps=300, batch_size=128, seed=2,
    )
    out_dir = str(tmp_path / "flat_env")
    save_nif_assets(model, meta, out_dir)
    env_fn, env_params = load_nif_env(out_dir)

    scene = make_primitive_scene()
    arrays, params, _ = build_scene(
        scene, image_width=16, image_height=16, samples_per_pixel=4,
        max_path_length=4,
    )
    out = render(
        arrays, params, mode="path-trace", chunk_size=256,
        env_fn=env_fn, env_params=env_params,
    )
    assert np.all(np.isfinite(out.rgb))
    # With a bright uniform env, the image must be clearly lit:
    assert out.rgb.mean() > 0.1


def test_megakernel_env_matches_xla_loop(tmp_path):
    """The in-kernel fused env MLP (ops/pallas/megakernel.py pack_env_mlp)
    must reproduce the XLA-loop integrator's env lighting: same NIF, same
    RNG streams, same estimator — differences bounded by bf16 matmul
    accumulation order and the kernel's polynomial atan2."""
    from ipu_ray_lib_tpu.render import streaming as S
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_primitive_scene

    h, w = 8, 16
    rng = np.random.default_rng(3)
    img = (0.3 + rng.random((h, w, 3))).astype(np.float32)
    model, meta = train_nif(img, embedding_dimension=3, layer_count=3,
                            layer_size=16, steps=300, batch_size=128, seed=2)
    out_dir = str(tmp_path / "env_assets")
    save_nif_assets(model, meta, out_dir)
    env_fn, env_params = load_nif_env(out_dir, rotation_degrees=30.0)
    assert env_fn.nif_config is not None

    scene = make_primitive_scene()
    arrays, params, _ = build_scene(
        scene, image_width=32, image_height=24, samples_per_pixel=4,
        max_path_length=4, intersector="pallas",
    )
    assert S._use_megakernel(params, env_fn)
    img_mk, done_mk = S.render_streaming(
        arrays, params, env_fn=env_fn, env_params=env_params, spp=4)
    orig = S._use_megakernel
    S._use_megakernel = lambda p, e: False
    try:
        img_xla, done_xla = S.render_streaming(
            arrays, params, env_fn=env_fn, env_params=env_params, spp=4)
    finally:
        S._use_megakernel = orig
    assert done_mk == done_xla == 32 * 24 * 4
    assert np.all(np.isfinite(img_mk))
    assert float(np.abs(img_mk - img_xla).max()) < 5e-3
    assert img_mk.mean() > 0.05  # actually lit by the env


def test_pack_env_mlp_layout():
    """pack_env_mlp: transposed kernels, bias in the homogeneous column,
    decode constants in econst — applying the packed form by hand must
    reproduce NifModel.apply."""
    from ipu_ray_lib_tpu.nif.model import NifConfig
    from ipu_ray_lib_tpu.ops.pallas.megakernel import pack_env_mlp

    rng = np.random.default_rng(11)
    E = 2
    config = NifConfig(
        embedding_dimension=E,
        activations=("relu", "linear"),
        concat_before=(False, True),
        log_tone_map=True,
    )
    k0 = rng.normal(size=(4 * E, 16)).astype(np.float32)
    k1 = rng.normal(size=(16 + 4 * E, 3)).astype(np.float32)
    b0 = rng.normal(size=16).astype(np.float32)
    b1 = rng.normal(size=3).astype(np.float32)
    params = {
        "kernels": (jnp.asarray(k0), jnp.asarray(k1)),
        "biases": (jnp.asarray(b0), jnp.asarray(b1)),
        "max": jnp.float32(2.5),
        "mean": jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
        "rotation": jnp.float32(0.5),
    }
    env_cfg, (wstack, ebias, econst) = pack_env_mlp(config, params)
    P, E_, layers, log_tm = env_cfg
    assert P == 128 and E_ == E and log_tm
    assert layers == ((4 * E, 16, True, False), (16 + 4 * E, 3, False, True))
    assert wstack.shape == (2 * P, P) and wstack.dtype == jnp.bfloat16
    w = np.asarray(wstack, np.float32)
    np.testing.assert_allclose(w[0:16, 0:4 * E], k0.T, rtol=8e-3, atol=8e-3)
    np.testing.assert_allclose(w[P:P + 3, 0:16 + 4 * E], k1.T, rtol=8e-3,
                               atol=8e-3)
    # Biases exact (f32, not folded through the bf16 matmul):
    be = np.asarray(ebias)
    np.testing.assert_array_equal(be[0:16, 0], b0)
    np.testing.assert_array_equal(be[0:3, 1], b1)
    e = np.asarray(econst)
    assert e[0, 0] == np.float32(0.5) and e[0, 1] == np.float32(2.5)
    np.testing.assert_allclose(e[0, 2:5], [0.1, 0.2, 0.3])

    # Hand-apply the packed form (f32) on a feature vector and compare
    # to the unpacked math:
    feats = rng.normal(size=(4 * E,)).astype(np.float32)
    x = np.zeros(P, np.float32)
    x[:4 * E] = feats
    wf = np.zeros_like(w)
    # rebuild f32 wstack without the bf16 cast for the check:
    wf[0:16, 0:4 * E] = k0.T
    wf[P:P + 3, 0:16 + 4 * E] = k1.T
    y = np.maximum(wf[0:P] @ x + be[:, 0], 0.0)
    x2 = np.zeros(P, np.float32)
    x2[:16] = y[:16]
    x2[16:16 + 4 * E] = feats
    out = (wf[P:2 * P] @ x2 + be[:, 1])[:3]
    want = np.maximum(feats @ k0 + b0, 0.0)
    want = np.concatenate([want, feats]) @ k1 + b1
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
