#!/bin/bash
# NoInstruct ablation (reference run_inbatch_no_instruct.sh): identical to
# run_inbatch.sh with query instructions disabled; artifacts land under the
# NoInstruct path suffix via the config updater.
set -e
ENABLE_INSTRUCT=False exec "$(dirname "$0")/run_inbatch.sh" "$@"
