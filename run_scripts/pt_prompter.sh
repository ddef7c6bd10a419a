#!/usr/bin/env bash
# mirrors /root/reference/run_scripts/pt_prompter.sh (horovodrun dropped: GSPMD dp
# mesh spans all local chips from one process)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PYTHONPATH:$PWD"

CONFIG_PATH='configs/pretrain_prompter.json'

python -m alpro_tpu.cli.run_prompter \
      --config $CONFIG_PATH \
      --output_dir output/pt_prompter/$(date '+%Y%m%d%H%M%S') "$@"
