from .device import force_platform
