from . import (
    bpe,
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
    "bpe",
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
