from alpro_tpu.evals.retrieval import eval_retrieval, retrieval_metrics_from_matrix
from alpro_tpu.evals.qa import evaluate_qa, pool_clip_logits
