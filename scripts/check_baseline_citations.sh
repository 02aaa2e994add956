#!/bin/bash
# Verify that every `scripts/...` / `experiments/...` path cited in
# BASELINE.md and COVERAGE.md exists in the working tree (VERDICT r4
# missing #1: a claim whose cited artifact is absent is unverifiable).
# Exit 1 and list the offenders if any citation dangles.
cd "$(dirname "$0")/.."
fail=0
for doc in BASELINE.md COVERAGE.md; do
    while read -r p; do
        # strip a trailing CLI flag ("scripts/ddim_roofline.py --no-tpu")
        f=${p%% *}
        if [ ! -e "$f" ]; then
            echo "DANGLING in $doc: $p"
            fail=1
        fi
    done < <(grep -oE '`(scripts|experiments)/[^`]+`' "$doc" | tr -d '\`' | sort -u)
done
[ $fail -eq 0 ] && echo "all BASELINE/COVERAGE artifact citations resolve"
exit $fail
