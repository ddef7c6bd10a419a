from alpro_tpu.objectives.vtc import vtc_loss
from alpro_tpu.objectives.vtm import sample_hard_negatives, vtm_loss_from_logits
from alpro_tpu.objectives.mlm import mlm_loss
from alpro_tpu.objectives.pem import (
    build_prompt_bank,
    pseudo_labels_from_feats,
    mpm_loss,
    masked_patch_mean,
)
