from . import (  # noqa: F401
    dedup,
    packing,
    portable,
    similarity,
    sketches,
    subword,
    text,
)
