#!/usr/bin/env bash
# Sharded default gate (r15, the verdict-#8 resolution, final form).
#
# The r13 contract keeps every oracle row in the default gate; the
# single-process wall grew past the target as rounds added full-oracle
# registrations (20:03 at the r15 tree — with only ~4m of CPU, i.e. the
# gate is LATENCY-bound: Spark job floors, single-threaded DuckDB
# oracle calls, fixture startup). pytest-xdist cannot be installed (no
# pip), so the shard split is two concurrent pytest PROCESSES over
# disjoint test sets:
#   shard A: the oracle-equality families (test_queries_oracle — all
#            registrations — plus the edge-corpus harness) and the
#            streaming twins (the other latency-dominated family);
#   shard B: everything else, run from a private working directory so
#            ./spark-warehouse (bucketed-table tests) never collides.
# Coverage is IDENTICAL to `pytest tests/ -x -q` (which remains fully
# supported, just slower); the gate fails if either shard fails.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
B_CWD="$(mktemp -d /tmp/msgate_b.XXXXXX)"
python -m pytest tests/test_queries_oracle.py tests/test_edge_corpus.py \
    tests/test_streaming.py -x -q &
A=$!
( cd "$B_CWD" && PYTHONPATH="$ROOT" python -m pytest "$ROOT/tests" -x -q \
    --ignore="$ROOT/tests/test_queries_oracle.py" \
    --ignore="$ROOT/tests/test_edge_corpus.py" \
    --ignore="$ROOT/tests/test_streaming.py" ) &
B=$!
SA=0; SB=0
wait "$A" || SA=$?
wait "$B" || SB=$?
rm -rf "$B_CWD"
echo "gate: shard A exit $SA, shard B exit $SB"
[ "$SA" -eq 0 ] && [ "$SB" -eq 0 ]
