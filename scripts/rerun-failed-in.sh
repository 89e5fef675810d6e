#!/usr/bin/env bash
# Clear status of failed runs below DIR so run-all-in.sh retries them.
set -u
ROOT="${1:?usage: rerun-failed-in.sh BATCH_DIR}"
find "$ROOT" -name status.log | while read -r st; do
    if ! grep -q completed "$st"; then
        echo "reset: $(dirname "$st")"
        rm -f "$st"
    fi
done
