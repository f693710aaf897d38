from . import dedup, portable, similarity, text  # noqa: F401
