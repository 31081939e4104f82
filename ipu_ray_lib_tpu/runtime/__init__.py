from .config import RuntimeConfig, acquire_devices, setup_compilation_cache
