from .metadata import NifMetadata
from .model import NifModel, load_nif_env, direction_to_equirect_uv
