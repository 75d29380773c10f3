from .base_task import BaseTask  # noqa: F401
from .tasks import build_task  # noqa: F401
from . import vision_tasks  # noqa: F401  (populates the task registry)
