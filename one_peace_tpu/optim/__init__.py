from .adamw import build_optimizer  # noqa: F401
from .lr_schedule import build_lr_schedule  # noqa: F401
