#!/usr/bin/env bash
# mirrors /root/reference/run_scripts/pt_alpro.sh (horovodrun dropped: GSPMD dp
# mesh spans all local chips from one process)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PYTHONPATH:$PWD"

CONFIG_PATH='configs/pretrain_alpro.json'

python -m alpro_tpu.cli.run_pretrain \
      --config $CONFIG_PATH \
      --output_dir output/pt_alpro/$(date '+%Y%m%d%H%M%S') "$@"
