from . import (
    corpus,
    curation,
    dedup,
    multimodal,
    retrieval,
    selection,
    similarity,
    sketches,
    text,
)

__all__ = [
    "corpus",
    "curation",
    "dedup",
    "multimodal",
    "retrieval",
    "selection",
    "similarity",
    "sketches",
    "text",
]
