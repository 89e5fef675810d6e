#!/usr/bin/env bash
# Run a single experiment in the given run directory (analog of the
# reference scripts/run-one.sh): expects one rootba_config*.toml in the
# directory; writes output.log and status.log.
set -u
DIR="${1:?usage: run-one.sh RUN_DIR [EXECUTABLE]}"
EXE="${2:-python -m rootba_tpu.cli.bal}"

cd "$DIR" || exit 1
CONFIG=$(ls rootba_config*.toml 2>/dev/null | head -n1)
if [ -z "$CONFIG" ]; then
    echo "no config in $DIR" | tee status.log
    exit 1
fi
echo "started $(date -Iseconds)" > status.log
if $EXE --config "$CONFIG" > output.log 2>&1; then
    echo "completed $(date -Iseconds)" >> status.log
else
    rc=$?
    if grep -qi "out of memory\|RESOURCE_EXHAUSTED" output.log; then
        echo "oom $(date -Iseconds)" >> status.log
    else
        echo "failed rc=$rc $(date -Iseconds)" >> status.log
    fi
    exit $rc
fi
