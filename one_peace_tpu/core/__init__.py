from . import config, registry  # noqa: F401
