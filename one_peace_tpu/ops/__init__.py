from .attention import multihead_attention  # noqa: F401
