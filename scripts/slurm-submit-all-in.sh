#!/usr/bin/env bash
# Submit every pending run below BATCH_DIR as one SLURM job each
# (analog of the reference's slurm batch scripts). Usage:
#   slurm-submit-all-in.sh BATCH_DIR [SBATCH_ARGS...]
set -u
ROOT="${1:?usage: slurm-submit-all-in.sh BATCH_DIR [SBATCH_ARGS...]}"
shift || true
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"

find "$ROOT" -name 'rootba_config*.toml' ! -name 'rootba_batch_config.toml' \
        | sort | while read -r cfg; do
    rundir=$(dirname "$cfg")
    if [ -f "$rundir/status.log" ] && grep -q completed "$rundir/status.log"; then
        echo "skip (done): $rundir"
        continue
    fi
    echo "submit: $rundir"
    sbatch "$@" --job-name="rootba_$(basename "$rundir")" \
        --output="$rundir/slurm-%j.out" \
        --wrap="bash '$SCRIPT_DIR/run-one.sh' '$rundir'"
done
