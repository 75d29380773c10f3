from .audio import AudioAdapter  # noqa: F401
from .image import ImageAdapter  # noqa: F401
from .text import TextAdapter  # noqa: F401
