#!/bin/bash
# Phased probe-gated scaling campaign: strict cell priority under scarce
# clear weather (the host freezes for hours at a time — see
# BENCH/BASELINE.md "Gating"). Phase 1 is the headline pair — arrow engine
# (the input-hint contract path) on the 600k-doc 64KB-page corpus,
# local[2] -> local[8] — sized so the fixed local-mode serial floor costs
# <15% of the low leg (the 200k corpus caps measurable efficiency at ~0.65
# regardless of compute scaling; see the serial-floor decomposition).
# Phase 2 is the all-JVM sql engine at the same pair; phase 3 the 4 -> 16
# pair on 400k docs. Each phase exits as soon as every cell has
# --target-clean clean samples, so clear windows always flow to the
# highest-priority unsatisfied pair. All samples (incl. pre-skipped frozen
# windows) append to BENCH/scaling_runs.jsonl; the report is best-of-CLEAN.
set -x
cd "$(dirname "$0")/.."
GATE=${GATE:-40}
python scripts/scaling_bench.py 600000 --low 2 --high 8 --n-docs2 600000 --low2 2 --high2 8 \
  --engine arrow --target-clean 2 --min-probe-gbs $GATE --max-minutes ${1:-150}
python scripts/scaling_bench.py 600000 --low 2 --high 8 --n-docs2 600000 --low2 2 --high2 8 \
  --engine sql --target-clean 2 --min-probe-gbs $GATE --max-minutes ${2:-90}
python scripts/scaling_bench.py 400000 --low 4 --high 16 --n-docs2 400000 --low2 4 --high2 16 \
  --engine arrow --target-clean 2 --min-probe-gbs $GATE --max-minutes ${3:-60}
python scripts/scaling_bench.py --min-probe-gbs $GATE --report
