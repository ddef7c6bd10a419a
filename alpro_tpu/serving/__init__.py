from alpro_tpu.serving.qa import VideoQAPredictor
from alpro_tpu.serving.retrieval import RetrievalIndex
from alpro_tpu.serving.sharded import ShardedRetrievalIndex

__all__ = ["RetrievalIndex", "ShardedRetrievalIndex", "VideoQAPredictor"]
