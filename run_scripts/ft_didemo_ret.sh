#!/usr/bin/env bash
# mirrors /root/reference/run_scripts/ft_didemo_ret.sh (horovodrun dropped: GSPMD dp
# mesh spans all local chips from one process)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PYTHONPATH:$PWD"

CONFIG_PATH='configs/didemo_ret.json'

python -m alpro_tpu.cli.run_video_retrieval \
      --config $CONFIG_PATH \
      --output_dir output/ft_didemo_ret/$(date '+%Y%m%d%H%M%S') "$@"
