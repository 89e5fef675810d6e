#!/usr/bin/env bash
# Show SLURM queue state for rootba jobs + run status summary.
set -u
squeue -u "$USER" -o "%.10i %.40j %.8T %.10M" 2>/dev/null | grep -E "JOBID|rootba_" || true
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
bash "$SCRIPT_DIR/list-jobs.sh" "${1:-.}"
