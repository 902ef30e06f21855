#!/bin/bash
# Round-4 probe-gated scaling campaign (VERDICT r3 next #1).
# One adaptive loop over every (engine x corpus x width) cell: each iteration
# probes the weather and, if clean, measures the cell with the fewest clean
# samples — good windows are never wasted, frozen stretches cost only cheap
# pre-skips. All samples append to BENCH/scaling_runs.jsonl.
set -x
cd "$(dirname "$0")/.."
python scripts/scaling_bench.py 400000 --campaign --engine sql,arrow --max-minutes ${1:-150}
python scripts/scaling_bench.py --report
