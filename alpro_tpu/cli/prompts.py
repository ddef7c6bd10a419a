"""Prompt templates for the PEM/MPM entity prompter.

Reference: `/root/reference/src/pretrain/run_pretrain_sparse.py:326-362` —
12 video templates + 12 image templates instantiated per entity.
"""

VIDEO_TEMPLATES = [
    "A footage of a {}.",
    "A footage of the {}.",
    "A footage of one {}.",
    "A video of a {}.",
    "A video of the {}.",
    "A video of one {}.",
    "A portrait of a {}.",
    "A portrait of the {}.",
    "A portrait of one {}.",
    "A video footage of a {}.",
    "A video footage of the {}.",
    "A video footage of one {}.",
]

IMAGE_TEMPLATES = [
    "A photo of a {}.",
    "A photo of the {}.",
    "A photo of one {}.",
    "A picture of a {}.",
    "A picture of the {}.",
    "A picture of one {}.",
    "A good photo of the {}.",
    "A good photo of a {}.",
    "A good photo of one {}.",
    "A good picture of the {}.",
    "A good picture of a {}.",
    "A good picture of one {}.",
]


def load_entities(path: str, num_entities: int):
    """Entity vocabulary: first `num_entities` lines of the unigram file
    (`run_pretrain_sparse.py` entity_file_path handling)."""
    with open(path) as f:
        ents = [l.strip().split()[0] for l in f if l.strip()]
    return ents[:num_entities]


def build_prompt_strings(entities, templates):
    """Template-major order: template t covers rows
    [t*num_entities, (t+1)*num_entities) — matching the prompt-bank
    ensembling layout (`alpro_models.py:470-475`)."""
    return [t.format(e) for t in templates for e in entities]
