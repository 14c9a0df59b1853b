from . import sh, quat  # noqa: F401
