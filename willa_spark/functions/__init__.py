from . import corpus, curation, dedup, multimodal, similarity, text

__all__ = ["corpus", "curation", "dedup", "multimodal", "similarity", "text"]
