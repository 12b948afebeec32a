#!/bin/sh
# One sequential TPU measurement session (single process at a time; the
# axon relay is single-holder — CLAUDE.md environment gotchas).
#
#   nohup sh scripts/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
#
# Runs, in order: stage profile, the production bench, and a drift-trace
# bench. Each step's output is kept separately under /tmp.
set -x
cd "$(dirname "$0")/.."
# scripts/*.py import housescan_tpu: python puts the SCRIPT's dir on
# sys.path, not the cwd, so the repo root must be on PYTHONPATH.
PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
export PYTHONPATH

python scripts/profile_step.py > /tmp/ts_profile.out 2>&1

python bench.py > /tmp/ts_bench.out 2>&1

HOUSESCAN_BENCH_TRACE=1 python bench.py > /tmp/ts_bench_trace.out 2>&1

echo DONE
