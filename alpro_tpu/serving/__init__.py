from alpro_tpu.serving.qa import VideoQAPredictor
from alpro_tpu.serving.retrieval import RetrievalIndex

__all__ = ["RetrievalIndex", "VideoQAPredictor"]
