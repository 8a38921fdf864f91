from .device import force_platform
from .cache import enable_compilation_cache
