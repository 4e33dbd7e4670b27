from . import (
    bpe,
    corpus,
    curation,
    dedup,
    multimodal,
    pq,
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
    "pq",
    "retrieval",
    "selection",
    "similarity",
    "sketches",
    "text",
]
