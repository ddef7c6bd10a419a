#!/usr/bin/env bash
# mirrors /root/reference/run_scripts/ft_msvd_qa.sh (horovodrun dropped: GSPMD dp
# mesh spans all local chips from one process)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PYTHONPATH:$PWD"

CONFIG_PATH='configs/msvd_qa.json'

python -m alpro_tpu.cli.run_video_qa \
      --config $CONFIG_PATH \
      --output_dir output/ft_msvd_qa/$(date '+%Y%m%d%H%M%S') "$@"
