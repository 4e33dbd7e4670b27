from . import corpus, curation, dedup, multimodal, retrieval, similarity, text

__all__ = [
    "corpus",
    "curation",
    "dedup",
    "multimodal",
    "retrieval",
    "similarity",
    "text",
]
