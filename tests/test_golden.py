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
