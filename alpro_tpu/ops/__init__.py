from alpro_tpu.ops.attention import multi_head_attention
