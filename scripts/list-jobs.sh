#!/usr/bin/env bash
# Summarize run status below DIR (analog of reference list-jobs.sh).
set -u
ROOT="${1:-.}"
total=0; completed=0; failed=0; pending=0
while read -r cfg; do
    dir=$(dirname "$cfg")
    total=$((total+1))
    if [ -f "$dir/status.log" ]; then
        if grep -q completed "$dir/status.log"; then
            completed=$((completed+1))
        else
            failed=$((failed+1)); echo "FAILED: $dir"
        fi
    else
        pending=$((pending+1))
    fi
done < <(find "$ROOT" -name 'rootba_config*.toml' ! -name 'rootba_batch_config.toml' | sort)
echo "total: $total, completed: $completed, failed: $failed, pending: $pending"
