"""Golden-image radiometry regression.

The variant-parity tests pin every walk configuration bitwise against
the session's own base render — they cannot see a change to the base
math itself (acceptance chain, RNG streams, shading, banking). This
golden image (Cornell box + plinth, 48x32, spp 2, fixed seed, pallas
megakernel on the CPU backend) pins the absolute radiometry.

Tolerance, not hashes: XLA CPU codegen may drift a ulp across toolchain
upgrades; real radiometry bugs (payload leaks, RNG stream changes,
acceptance-band edits) move pixels by far more than 1e-5. An
INTENTIONAL estimator change must regenerate the asset (command below)
and say so in the commit.

Regenerate:
    python - <<'EOF'
    import jax; jax.config.update('jax_platforms','cpu')
    import numpy as np
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene
    import ipu_ray_lib_tpu.render.streaming as S
    scene = make_cornell_box_scene(None, box_only=False)
    arrays, params, _ = build_scene(scene, image_width=48, image_height=32,
                                    samples_per_pixel=2,
                                    intersector="pallas")
    rgb, _ = S.render_streaming(arrays, params, spp=2)
    np.save('tests/golden/box48x32_spp2.npy', np.asarray(rgb))
    EOF
"""

import os

import numpy as np


def test_golden_box_radiometry():
    from ipu_ray_lib_tpu.render.streaming import render_streaming
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    golden = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "box48x32_spp2.npy"))
    scene = make_cornell_box_scene(None, box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=48, image_height=32, samples_per_pixel=2,
        intersector="pallas")
    rgb, done = render_streaming(arrays, params, spp=2)
    assert done == 48 * 32 * 2
    np.testing.assert_allclose(np.asarray(rgb), golden, rtol=1e-5,
                               atol=1e-5)


def test_golden_spheres_nif_radiometry():
    """Absolute radiometry of the spheres + fused-NIF-env megakernel
    path (analytic primitives + in-kernel bf16 env MLP + deferred env
    flushes) — the config the Cornell golden cannot see.

    Regenerate (intentional estimator changes only):
        python - <<'PY'
        import jax; jax.config.update('jax_platforms','cpu')
        import numpy as np
        from ipu_ray_lib_tpu.scene.build import build_scene
        from ipu_ray_lib_tpu.scene.builtin import make_primitive_scene
        from ipu_ray_lib_tpu.nif import load_nif_env
        import ipu_ray_lib_tpu.render.streaming as S
        env_fn, env_params = load_nif_env('assets/nif/synthetic_urban_4k')
        scene = make_primitive_scene()
        arrays, params, _ = build_scene(scene, image_width=48,
                                        image_height=32,
                                        samples_per_pixel=2,
                                        intersector='pallas')
        rgb, _ = S.render_streaming(arrays, params, spp=2, env_fn=env_fn,
                                    env_params=env_params)
        np.save('tests/golden/spheres_nif48x32_spp2.npy', np.asarray(rgb))
        PY
    """
    from ipu_ray_lib_tpu.nif import load_nif_env
    from ipu_ray_lib_tpu.render.streaming import render_streaming
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_primitive_scene

    root = os.path.join(os.path.dirname(__file__), "..")
    golden = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "spheres_nif48x32_spp2.npy"))
    env_fn, env_params = load_nif_env(
        os.path.join(root, "assets", "nif", "synthetic_urban_4k"))
    scene = make_primitive_scene()
    arrays, params, _ = build_scene(
        scene, image_width=48, image_height=32, samples_per_pixel=2,
        intersector="pallas")
    rgb, done = render_streaming(arrays, params, spp=2, env_fn=env_fn,
                                 env_params=env_params)
    assert done == 48 * 32 * 2
    np.testing.assert_allclose(np.asarray(rgb), golden, rtol=1e-5,
                               atol=1e-5)


def test_golden_hbm_radiometry():
    """Absolute radiometry of the HBM-streamed megakernel (pn8 super
    packing, double-buffered DMA walk) on the stress terrain — pins the
    streaming path's base math, which the VMEM goldens cannot see.

    Regenerate (intentional estimator changes only):
        python - <<'PY'
        import jax; jax.config.update('jax_platforms','cpu')
        import numpy as np
        from ipu_ray_lib_tpu.scene.build import build_scene
        from ipu_ray_lib_tpu.scene.builtin import make_stress_scene
        import ipu_ray_lib_tpu.render.streaming as S
        scene = make_stress_scene(24)
        arrays, params, _ = build_scene(scene, image_width=32,
                                        image_height=32,
                                        samples_per_pixel=2,
                                        max_path_length=4,
                                        intersector='pallas-hbm')
        rgb, _ = S.render_streaming(arrays, params, spp=2)
        np.save('tests/golden/stress24_hbm32x32_spp2.npy', np.asarray(rgb))
        PY
    """
    from ipu_ray_lib_tpu.render.streaming import render_streaming
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_stress_scene

    golden = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "stress24_hbm32x32_spp2.npy"))
    scene = make_stress_scene(24)
    arrays, params, _ = build_scene(
        scene, image_width=32, image_height=32, samples_per_pixel=2,
        max_path_length=4, intersector="pallas-hbm")
    rgb, done = render_streaming(arrays, params, spp=2)
    assert done == 32 * 32 * 2
    np.testing.assert_allclose(np.asarray(rgb), golden, rtol=1e-5,
                               atol=1e-5)
