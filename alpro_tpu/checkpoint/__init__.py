from alpro_tpu.checkpoint.torch_convert import (
    convert_reference_state_dict,
    load_reference_checkpoint,
)
