#!/usr/bin/env bash
# Download the BAL problem suite (97 problems in 5 families) from the
# Bundle Adjustment in the Large project page (analog of the reference
# scripts/download-bal-problems.sh). Usage:
#   download-bal-problems.sh [tutorial|all] [TARGET_DIR]
set -eu
SUBSET="${1:-tutorial}"
TARGET="${2:-data/bal}"
BASE="https://grail.cs.washington.edu/projects/bal"

declare -A FAMILY_PAGE=(
    [ladybug]=ls [trafalgar]=tr [dubrovnik]=db [venice]=ve [final]=fi
)

tutorial_problems="ladybug/problem-49-7776 ladybug/problem-73-11032 ladybug/problem-138-19878 ladybug/problem-318-41628 ladybug/problem-372-47423 ladybug/problem-412-52215 ladybug/problem-460-56811 ladybug/problem-539-65220 ladybug/problem-598-69218 ladybug/problem-646-73584"

mkdir -p "$TARGET"
fetch() {
    local family=$1 stem=$2
    local dir="$TARGET/$family"
    mkdir -p "$dir"
    local url="$BASE/data/$family/${stem}-pre.txt.bz2"
    local out="$dir/${stem}-pre.txt"
    if [ -f "$out" ]; then echo "have $out"; return; fi
    echo "fetch $url"
    curl -fsSL "$url" | bunzip2 > "$out"
}

if [ "$SUBSET" = tutorial ]; then
    for p in $tutorial_problems; do
        fetch "${p%%/*}" "${p##*/}"
    done
else
    echo "Fetching index pages for all 97 problems..."
    for family in ladybug trafalgar dubrovnik venice final; do
        curl -fsSL "$BASE/${FAMILY_PAGE[$family]}.html" \
            | grep -o "problem-[0-9]*-[0-9]*" | sort -u | while read -r stem; do
            fetch "$family" "$stem"
        done
    done
fi
