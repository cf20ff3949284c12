#!/bin/bash
# UniRAG eval pipeline for BLIPFeatureFusion: embed -> index -> raw retrieval dump of
# {query, candidates} jsonl with complement (image,text) pairs for RAG
# consumers (reference large/eval/unirag/run_eval_pipeline_unirag.sh).
# Uses the local unirag embed/index archetypes (inbatch configs pinned to
# Instruct/UniRAG); instruct status is forced on, as in the reference.
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
      --enable_instruct True
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
    --query_embedder_config_path "$CONFIG_DIR/embed.yaml" \
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \
    --enable_retrieval
