"""Frame-index sampling strategies.

Reference: `/root/reference/src/datasets/dataset_base.py:154-174`. All five
strategies preserved; `rand`/`headtail`/`nlvl_rand` consume the provided
numpy Generator for reproducibility (the reference uses the global
random/np.random state).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def sample_frame_indices(
    vlen: int,
    num_frm: int,
    strategy: str = "uniform",
    rng: Optional[np.random.Generator] = None,
    start_idx: int = 0,
    end_idx: Optional[int] = None,
) -> np.ndarray:
    if end_idx is None:
        end_idx = vlen
    rng = rng or np.random.default_rng()

    if strategy == "uniform":
        # reference passes dtype=int to arange with a float step: indices are
        # generated from the float grid then truncated
        idx = np.arange(start_idx, end_idx, vlen / num_frm).astype(int)
    elif strategy == "nlvl_uniform":
        idx = np.arange(start_idx, end_idx, vlen / num_frm).astype(int)
    elif strategy == "nlvl_rand":
        idx = np.arange(start_idx, end_idx, vlen / num_frm).astype(int)
        strides = np.concatenate([np.diff(idx), [vlen - idx[-1]]])
        perturb = np.array(
            [rng.integers(0, max(s, 1)) for s in strides], dtype=idx.dtype
        )
        idx = idx + perturb
    elif strategy == "rand":
        idx = np.sort(rng.choice(vlen, size=min(num_frm, vlen), replace=False))
    elif strategy == "headtail":
        half = vlen // 2
        n_head = num_frm // 2
        n_tail = num_frm - n_head
        head = np.sort(rng.choice(max(half, 1), size=min(n_head, max(half, 1)), replace=False))
        tail = np.sort(
            half + rng.choice(max(vlen - half, 1), size=min(n_tail, max(vlen - half, 1)), replace=False)
        )
        idx = np.concatenate([head, tail])
    else:
        raise NotImplementedError(f"Invalid sampling strategy {strategy}")

    return np.clip(idx, 0, vlen - 1)[:num_frm]
