"""Config system with the reference's JSON-overlay-over-argparse semantics.

Mirrors the behaviour of the reference config layer
(`/root/reference/src/configs/config.py:12-29,218-224`): a JSON config file
fills any flag that was not explicitly passed on the command line, CLI flags
always win, and int flags declared as booleans (0/1) are coerced to bool.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Dict, List, Optional


class Config(dict):
    """A dict with attribute access (stand-in for easydict.EasyDict)."""

    def __getattr__(self, name: str) -> Any:
        try:
            val = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return val

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, Config):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [Config._wrap(v) for v in value]
        return value

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = Config._wrap(v)


def load_json_config(path: str) -> Config:
    with open(path) as f:
        return Config(json.load(f))


def parse_with_config(
    parser: argparse.ArgumentParser, argv: Optional[List[str]] = None
) -> Config:
    """Parse args; if --config is given, JSON values override argparse defaults
    but explicit CLI flags override the JSON.

    Reference semantics: `src/configs/config.py:12-29` detects explicit CLI
    flags by scanning argv for `--key`.
    """
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    parsed = parser.parse_args(argv)
    args = Config(vars(parsed))
    if getattr(parsed, "config", None):
        config_args = load_json_config(parsed.config)
        override_keys = {
            arg[2:].split("=")[0] for arg in argv if arg.startswith("--")
        }
        for k, v in config_args.items():
            if k not in override_keys:
                args[k] = Config._wrap(v)
    del args["config"]
    return _coerce_bool_flags(args)


# flags that the reference declares as 0/1 ints but uses as booleans
# (`src/configs/config.py:218-224`)
_BOOL_FLAGS = (
    "do_inference",
    "pin_mem",
    "use_itm",
    "use_mlm",
    "use_itc",
    "use_mpm",
    "fp16",
    "debug",
    "albef_init",
)


def _coerce_bool_flags(args: Config) -> Config:
    for k in _BOOL_FLAGS:
        if k in args and isinstance(args[k], int):
            args[k] = bool(args[k])
    return args


def str2bool(v: Any) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def shared_training_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Common flag superset mirroring `src/configs/config.py:30-243`."""
    parser.add_argument("--config", type=str, default=None, help="JSON config path")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--debug", type=int, default=0)
    parser.add_argument("--data_ratio", type=float, default=1.0)
    parser.add_argument("--model_config", type=str, default=None)
    parser.add_argument("--visual_model_cfg", type=str, default=None)
    parser.add_argument("--tokenizer_dir", type=str, default=None)
    parser.add_argument("--e2e_weights_path", type=str, default=None)
    parser.add_argument("--visual_weights_path", type=str, default=None)
    parser.add_argument("--max_txt_len", type=int, default=40)
    parser.add_argument("--crop_img_size", type=int, default=224)
    parser.add_argument("--resize_size", type=int, default=256)
    parser.add_argument("--img_pixel_mean", type=float, nargs=3, default=None)
    parser.add_argument("--img_pixel_std", type=float, nargs=3, default=None)
    parser.add_argument("--img_input_format", type=str, default="RGB")
    parser.add_argument("--num_frm", type=int, default=8)
    parser.add_argument("--frm_sampling_strategy", type=str, default="uniform")
    parser.add_argument("--train_n_clips", type=int, default=1)
    parser.add_argument("--train_batch_size", type=int, default=8)
    parser.add_argument("--val_batch_size", type=int, default=8)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--learning_rate", type=float, default=5e-5)
    parser.add_argument("--log_interval", type=int, default=100)
    parser.add_argument("--num_valid", type=int, default=20)
    parser.add_argument("--min_valid_steps", type=int, default=100)
    parser.add_argument("--save_steps_ratio", type=float, default=0.01)
    parser.add_argument("--num_train_epochs", type=int, default=10)
    parser.add_argument("--optim", type=str, default="adamw")
    parser.add_argument("--betas", type=float, nargs=2, default=[0.9, 0.98])
    parser.add_argument("--decay", type=str, default="linear")
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--weight_decay", type=float, default=1e-3)
    parser.add_argument("--grad_norm", type=float, default=2.0)
    parser.add_argument("--warmup_ratio", type=float, default=0.1)
    parser.add_argument("--transformer_lr_mul", type=float, default=1.0)
    parser.add_argument("--step_decay_epochs", type=int, nargs="+", default=None)
    parser.add_argument("--adam_mu_dtype", type=str, default=None,
                        choices=["bfloat16", "float32"],
                        help="AdamW first-moment storage dtype; bfloat16 "
                             "halves m-state HBM (default fp32, reference "
                             "parity)")
    parser.add_argument("--adam_nu_dtype", type=str, default=None,
                        choices=["bfloat16", "float32"],
                        help="AdamW second-moment storage dtype; bfloat16 "
                             "halves v-state HBM but perturbs the "
                             "per-parameter step scale (sqrt(nu)) — "
                             "opt-in only (default fp32)")
    parser.add_argument("--fp16", type=int, default=0)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--n_workers", type=int, default=4)
    # lax.scan over encoder blocks (12x smaller HLO, faster compiles);
    # checkpoints stay in the unrolled layout either way
    parser.add_argument("--scan_blocks", type=int, default=1)
    parser.add_argument("--pin_mem", type=int, default=1)
    parser.add_argument("--do_inference", type=int, default=0)
    parser.add_argument("--inference_model_step", type=str, default="")
    # direct path to a (possibly torch) checkpoint to run inference with —
    # the golden-gate entry point; reference expresses this as
    # e2e_weights_path when not using a run-local step
    parser.add_argument("--inference_model_ckpt", type=str, default=None)
    parser.add_argument("--inference_split", type=str, default="val")
    parser.add_argument("--inference_txt_db", type=str, default=None)
    parser.add_argument("--inference_img_db", type=str, default=None)
    parser.add_argument("--inference_batch_size", type=int, default=64)
    parser.add_argument("--inference_n_clips", type=int, default=1)
    # TPU-native additions
    parser.add_argument("--mesh_shape", type=int, nargs="+", default=None,
                        help="device mesh shape: --mesh_shape 8 for dp=8; "
                        "--mesh_shape 4 2 for a 2D dp=4 x sp=2 mesh (sp "
                        "shards the temporal-attention frame axis — "
                        "long-video sequence parallelism)")
    parser.add_argument("--attn_impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--profile", type=int, default=0,
                        help="trace 5 train steps with jax.profiler")
    parser.add_argument(
        "--xla_compiler_options", type=str, default="",
        help="comma-separated key=value XLA backend flags applied to the "
             "train-step compile (e.g. xla_tpu_scoped_vmem_limit_kib=65536);"
             " invalid names fail loudly at compile time")
    from alpro_tpu.models.remat import REMAT_POLICIES

    parser.add_argument(
        "--remat_policy", type=str, default="dots_ln",
        choices=list(REMAT_POLICIES),
        help="what per-block gradient checkpointing keeps (models/remat.py);"
             " 'dots_ln' (dots ∪ saved LN statistics) measured fastest on "
             "TPU in both scanned and unrolled graphs, 'nothing' = "
             "reference-equivalent full recompute",
    )
    return parser


def get_video_retrieval_args(argv=None) -> Config:
    parser = argparse.ArgumentParser("video retrieval")
    shared_training_args(parser)
    parser.add_argument("--train_datasets", type=json.loads, default=None)
    parser.add_argument("--val_datasets", type=json.loads, default=None)
    parser.add_argument("--eval_retrieval_batch_size", type=int, default=256)
    parser.add_argument(
        "--eval_rerank_topk", type=int, default=0,
        help="0 (default): the exact reference protocol — VTM-score every "
             "(video, text) pair. K>0: VTM-rerank only each text's K best "
             "VTC candidates (the serving-index candidate protocol applied "
             "to the eval gate; non-candidates rank below by VTC sim). "
             "~V/K cheaper; exact whenever the protocol's own top ranks "
             "fall inside the VTC top-K. text2video ranks candidates "
             "exactly; with 0<K<V the transposed video2text direction is "
             "a coarser approximation (only texts that shortlisted the "
             "video get VTM ranks)")
    return parse_with_config(parser, argv)


def get_video_qa_args(argv=None) -> Config:
    parser = argparse.ArgumentParser("video qa")
    shared_training_args(parser)
    parser.add_argument("--train_datasets", type=json.loads, default=None)
    parser.add_argument("--val_datasets", type=json.loads, default=None)
    parser.add_argument("--task", type=str, default="msrvtt_qa")
    # multi-choice (action/transition) option count — reference
    # VideoQACollator n_options (`dataset_video_qa.py:159-163`)
    parser.add_argument("--n_options", type=int, default=5)
    parser.add_argument("--ans2label_path", type=str, default=None)
    parser.add_argument("--num_labels", type=int, default=1500)
    parser.add_argument("--classifier", type=str, default="mlp")
    parser.add_argument("--cls_hidden_scale", type=int, default=2)
    parser.add_argument("--score_agg_func", type=str, default="mean",
                        choices=["mean", "max", "lse"])
    return parse_with_config(parser, argv)


def get_pretraining_args(argv=None) -> Config:
    parser = argparse.ArgumentParser("pretrain")
    shared_training_args(parser)
    parser.add_argument("--train_datasets", type=json.loads, default=None)
    parser.add_argument("--val_datasets", type=json.loads, default=None)
    parser.add_argument("--use_itm", type=int, default=1)
    parser.add_argument("--use_mlm", type=int, default=1)
    parser.add_argument("--use_itc", type=int, default=1)
    parser.add_argument("--use_mpm", type=int, default=1)
    parser.add_argument("--model_type", type=str, default="pretrain")
    parser.add_argument("--teacher_weights_path", type=str, default=None)
    parser.add_argument("--entity_file_path", type=str, default=None)
    parser.add_argument("--num_entities", type=int, default=1000)
    parser.add_argument("--fps", type=float, default=0.5)
    parser.add_argument("--albef_init", type=int, default=0)
    return parse_with_config(parser, argv)
