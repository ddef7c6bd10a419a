#!/usr/bin/env bash
# mirrors /root/reference/run_scripts/inf_msrvtt_qa.sh
cd "$(dirname "$0")/.."
export PYTHONPATH="$PYTHONPATH:$PWD"

STEP='best'
CONFIG_PATH='configs/msrvtt_qa.json'

python -m alpro_tpu.cli.run_video_qa \
      --do_inference 1 \
      --inference_split test \
      --inference_model_step $STEP \
      --inference_batch_size 64 \
      --config $CONFIG_PATH \
      --output_dir output/inf_msrvtt_qa "$@"
