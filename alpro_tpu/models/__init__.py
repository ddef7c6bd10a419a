from alpro_tpu.models.timesformer import TimeSformer, TimeSformerConfig
from alpro_tpu.models.bert import BertConfig, BertModel, BertMLMHead
from alpro_tpu.models.alpro import (
    AlproModel,
    AlproConfig,
    build_retrieval_model,
    build_qa_model,
    build_pretrain_model,
    build_prompter_model,
)
