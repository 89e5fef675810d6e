#!/usr/bin/env bash
# Sequentially run all experiments below the given directory (analog of
# the reference scripts/run-all-in.sh:27-61): every directory containing
# a rootba_config.toml without a completed status.log is run with
# run-one.sh.
set -u
ROOT="${1:?usage: run-all-in.sh BATCH_DIR [EXECUTABLE]}"
EXE="${2:-python -m rootba_tpu.cli.bal}"
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"

find "$ROOT" -name 'rootba_config*.toml' ! -name 'rootba_batch_config.toml' \
        | sort | while read -r cfg; do
    rundir=$(dirname "$cfg")
    if [ -f "$rundir/status.log" ] && grep -q completed "$rundir/status.log"; then
        echo "skip (done): $rundir"
        continue
    fi
    echo "run: $rundir"
    bash "$SCRIPT_DIR/run-one.sh" "$rundir" "$EXE"
done
