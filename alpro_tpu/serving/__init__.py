from alpro_tpu.serving.retrieval import RetrievalIndex

__all__ = ["RetrievalIndex"]
