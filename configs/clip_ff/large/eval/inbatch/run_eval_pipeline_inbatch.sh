#!/bin/bash
# Full eval pipeline for CLIPFeatureFusion: embed -> index -> retrieve -> Recall@k.
# One environment, one process (the reference needed separate torch/faiss envs).
set -e
REPO="$(cd "$(dirname "$0")/../../../../.." && pwd)"
UNIIR_DIR="${UNIIR_DIR:-/data/UniIR}"
MBEIR_DATA_DIR="${MBEIR_DATA_DIR:-/data/UniIR/mbeir_data}"
CONFIG_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO:$PYTHONPATH"

for Y in embed.yaml index.yaml retrieval.yaml; do
  python -m uniir_tpu.tools.config_updater \
      --update_mbeir_yaml_instruct_status \
      --mbeir_yaml_file_path "$CONFIG_DIR/$Y" \
      --enable_instruct "${ENABLE_INSTRUCT:-True}"
done

python -m uniir_tpu.tools.pipeline \
    --config_path "$CONFIG_DIR/embed.yaml" \
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \
    --enable_embed

python -m uniir_tpu.tools.pipeline \
    --config_path "$CONFIG_DIR/index.yaml" \
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \
    --enable_create_index

python -m uniir_tpu.tools.pipeline \
    --config_path "$CONFIG_DIR/retrieval.yaml" \
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \
    --enable_retrieval
