"""Golden-number release gates (SURVEY.md §4(1), `README.md:97-108`).

The reference's de-facto integration test is exact metric reproduction of
its published numbers with the official checkpoints. Those checkpoints and
datasets cannot be downloaded in this sandbox, so these gates self-skip
unless the operator stages the assets and points ``ALPRO_GOLDEN_DIR`` at:

    $ALPRO_GOLDEN_DIR/
      msrvtt_ret/ann.jsonl        # 1000 eval rows (docs/DATA.md schema)
      msrvtt_ret/videos/          # <vid_id>.mp4 (or .npy raw clips)
      msrvtt_ret/msrvtt_ret.pt    # official finetuned checkpoint
      msvd_qa/ann.jsonl  msvd_qa/videos/  msvd_qa/ans2label.json
      msvd_qa/msvd_qa.pt
      ext/bert-base-uncased/      # tokenizer assets

With assets present, each gate runs the real CLI inference path end-to-end
(decode → samplers → towers → protocol → metrics) and asserts the
reference's published numbers within ±0.5 (bf16 + decoder drift headroom;
the reference itself reproduces to the decimal only with bit-identical
decode). Expected: MSRVTT t2v R@1 33.9 (`README.md:102`), MSVD-QA overall
45.91% (`README.md:108`).
"""

import json
import os

import pytest

GOLDEN = os.environ.get("ALPRO_GOLDEN_DIR", "")


def _gate(path: str) -> str:
    full = os.path.join(GOLDEN, path)
    if not (GOLDEN and os.path.exists(full)):
        pytest.skip(f"golden assets not staged ({full}); see module docstring")
    return full


@pytest.mark.golden
def test_msrvtt_retrieval_r1_gate(tmp_path):
    ann = _gate("msrvtt_ret/ann.jsonl")
    vids = _gate("msrvtt_ret/videos")
    ckpt = _gate("msrvtt_ret/msrvtt_ret.pt")
    tok = _gate("ext/bert-base-uncased")

    from alpro_tpu.core.config import Config
    from alpro_tpu.cli.run_video_retrieval import start_inference

    cfg = Config({
        "do_inference": 1,
        "inference_txt_db": ann,
        "inference_img_db": vids,
        "inference_model_ckpt": ckpt,
        "tokenizer_dir": tok,
        "num_frm": 8,
        "resize_size": 256,
        "crop_img_size": 224,
        "inference_batch_size": 64,
        "output_dir": str(tmp_path),
        "model_config": os.path.join(GOLDEN, "msrvtt_ret/base_model.json"),
        "visual_model_cfg": os.path.join(GOLDEN, "msrvtt_ret/vis_model.json"),
    })
    metrics = start_inference(cfg)
    r1 = metrics["text2video"]["r1"]
    # reference `README.md:102`: {'r1': 33.9, 'r5': 60.7, 'r10': 73.2}
    assert abs(r1 - 33.9) <= 0.5, f"MSRVTT t2v R@1 {r1} vs published 33.9"


@pytest.mark.golden
def test_msvd_qa_accuracy_gate(tmp_path):
    ann = _gate("msvd_qa/ann.jsonl")
    vids = _gate("msvd_qa/videos")
    ckpt = _gate("msvd_qa/msvd_qa.pt")
    tok = _gate("ext/bert-base-uncased")
    ans2label = _gate("msvd_qa/ans2label.json")

    from alpro_tpu.core.config import Config
    from alpro_tpu.cli.run_video_qa import start_inference

    cfg = Config({
        "do_inference": 1,
        "inference_txt_db": ann,
        "inference_img_db": vids,
        "inference_model_ckpt": ckpt,
        "tokenizer_dir": tok,
        "ans2label_path": ans2label,
        "task": "msvd_qa",
        "num_labels": 2423,
        "num_frm": 16,
        "resize_size": 256,
        "crop_img_size": 224,
        "inference_batch_size": 32,
        "output_dir": str(tmp_path),
        "model_config": os.path.join(GOLDEN, "msvd_qa/base_model.json"),
        "visual_model_cfg": os.path.join(GOLDEN, "msvd_qa/vis_model.json"),
    })
    metrics = start_inference(cfg)
    acc = metrics["overall_acc"] * (100.0 if metrics["overall_acc"] <= 1 else 1.0)
    # reference `README.md:108`: 45.91% overall
    assert abs(acc - 45.91) <= 0.5, f"MSVD-QA accuracy {acc} vs published 45.91"
