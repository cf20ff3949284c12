#!/bin/bash
# NoInstruct eval ablation (reference run_eval_pipeline_inbatch_no_instruct.sh):
# the full embed -> index -> retrieve pipeline with instructions disabled.
set -e
ENABLE_INSTRUCT=False exec "$(dirname "$0")/run_eval_pipeline_inbatch.sh" "$@"
