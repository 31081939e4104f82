from .types import (
    Camera,
    CropWindow,
    HostMesh,
    Material,
    MaterialType,
    PathTraceSettings,
    SceneDescription,
)
from .builtin import make_cornell_box_scene, make_primitive_scene
from .build import SceneArrays, SceneParams, build_scene
