"""OFF (Object File Format) mesh import.

Part of the assimp-breadth parity set (ref: src/scene_utils.cpp:152-317
— assimp ships an OFF loader). Plain and binary-free: counts line, then
vertices, then polygonal faces (fan-triangulated). No materials or
camera in the format: default diffuse material and origin camera, like
the STL/PLY importers.
"""

from __future__ import annotations

import numpy as np

from ..utils.log import logger
from .types import Camera, HostMesh, Material, SceneDescription


def import_off_scene(filename: str, load_normals: bool = False
                     ) -> SceneDescription:
    log = logger()
    with open(filename) as fh:
        tokens = []
        for line in fh:
            body = line.split("#")[0].strip()
            if body:
                tokens.extend(body.split())
    if not tokens or tokens[0] not in ("OFF", "COFF", "NOFF", "CNOFF"):
        raise ValueError(f"'{filename}' is not an OFF file")
    has_color = "C" in tokens[0]
    has_normal = "N" in tokens[0]
    pos = 1
    nv, nf = int(tokens[pos]), int(tokens[pos + 1])
    pos += 3  # skip edge count
    stride = 3 + (3 if has_normal else 0) + (4 if has_color else 0)
    verts = np.asarray(tokens[pos:pos + nv * stride],
                       np.float64).reshape(nv, stride)[:, :3]
    pos += nv * stride
    tris = []
    for _ in range(nf):
        k = int(tokens[pos])
        face = [int(t) for t in tokens[pos + 1:pos + 1 + k]]
        # face lines may carry trailing colour values — skip to next line
        # is not possible in token space; OFF colour-per-face appends up
        # to 4 numbers, detected as non-index floats is unreliable, so
        # we follow the common subset: indices only:
        pos += 1 + k
        for j in range(1, k - 1):
            tris.append((face[0], face[j], face[j + 1]))
    scene = SceneDescription()
    scene.materials = [Material(np.array([0.75, 0.75, 0.75], np.float32))]
    scene.meshes.append(HostMesh(
        triangles=np.asarray(tris, np.uint32).reshape(-1, 3),
        vertices=verts.astype(np.float32)))
    scene.mat_ids.append(0)
    log.warning("OFF has no camera; assuming origin looking down -z (fov 45)")
    scene.camera = Camera(horizontal_fov=float(np.pi / 4))
    scene.validate()
    log.info("Imported %d tris, %d verts from '%s'", len(tris), nv, filename)
    return scene
