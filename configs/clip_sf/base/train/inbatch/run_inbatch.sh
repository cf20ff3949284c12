#!/bin/bash
# Train CLIPScoreFusion on M-BEIR (TPU-native). One process drives the whole mesh.
set -e
REPO="$(cd "$(dirname "$0")/../../../../.." && pwd)"
UNIIR_DIR="${UNIIR_DIR:-/data/UniIR}"
MBEIR_DATA_DIR="${MBEIR_DATA_DIR:-/data/UniIR/mbeir_data}"
CONFIG_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO:$PYTHONPATH"

python -m uniir_tpu.tools.config_updater \
    --update_mbeir_yaml_instruct_status \
    --mbeir_yaml_file_path "$CONFIG_DIR/inbatch.yaml" \
    --enable_instruct "${ENABLE_INSTRUCT:-True}"

python -m uniir_tpu.train.trainer \
    --config_path "$CONFIG_DIR/inbatch.yaml" \
    --uniir_dir "$UNIIR_DIR" \
    --mbeir_data_dir "$MBEIR_DATA_DIR"
