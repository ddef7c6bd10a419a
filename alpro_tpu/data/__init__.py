from alpro_tpu.data.sampling import sample_frame_indices
from alpro_tpu.data.masking import mask_batch_text_tokens, random_erase
from alpro_tpu.data.transforms import (
    IMAGE_MEAN_CLIP,
    IMAGE_STD_CLIP,
    normalize_pixels,
    resize_shorter_side,
    random_square_crop,
    center_square_crop,
)
