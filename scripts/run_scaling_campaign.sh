#!/bin/bash
# Round-4 probe-gated scaling campaign (VERDICT r3 next #1).
# Phases ordered to secure the most informative numbers first; each phase
# stops early once every leg has --target-clean clean samples. All samples
# (clean, gated-out, weather-skipped) append to BENCH/scaling_runs.jsonl.
set -x
cd "$(dirname "$0")/.."
P=python
# primary legs (4 -> 16, 400k docs, 64 KB pages)
$P scripts/scaling_bench.py 400000 --campaign --engine sql   --max-minutes 40
$P scripts/scaling_bench.py 400000 --campaign --engine arrow --max-minutes 45
# secondary legs (2 -> 8, 200k docs)
$P scripts/scaling_bench.py 200000 --low 2 --high 8 --campaign --engine sql   --max-minutes 25
$P scripts/scaling_bench.py 200000 --low 2 --high 8 --campaign --engine arrow --max-minutes 30
$P scripts/scaling_bench.py --report
