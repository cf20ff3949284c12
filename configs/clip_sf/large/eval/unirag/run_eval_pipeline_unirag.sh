#!/bin/bash
# UniRAG raw retrieval for CLIPScoreFusion: dump {query, candidates} jsonl with
# complement (image,text) pairs for RAG consumers.
set -e
REPO="$(cd "$(dirname "$0")/../../../../.." && pwd)"
UNIIR_DIR="${UNIIR_DIR:-/data/UniIR}"
MBEIR_DATA_DIR="${MBEIR_DATA_DIR:-/data/UniIR/mbeir_data}"
CONFIG_DIR="$(cd "$(dirname "$0")" && pwd)"
EMBED_CONFIG="$CONFIG_DIR/../inbatch/embed.yaml"
export PYTHONPATH="$REPO:$PYTHONPATH"

python -m uniir_tpu.tools.pipeline \
    --config_path "$CONFIG_DIR/retrieval.yaml" \
    --query_embedder_config_path "$EMBED_CONFIG" \
    --uniir_dir "$UNIIR_DIR" --mbeir_data_dir "$MBEIR_DATA_DIR" \
    --enable_retrieval
