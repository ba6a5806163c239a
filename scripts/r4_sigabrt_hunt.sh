#!/bin/bash
# Round-4 SIGABRT hunt (VERDICT r3 weak #1 / next-round item 3).
#
# The slow suite aborted in 2 of 3 full runs during round 3 ("Fatal Python
# error: Aborted", main thread inside the jitted CPU train step, no C++
# diagnostic — pytest's capture swallowed any glibc/abseil message).
# This harness reruns the slow set N times with diagnostics that survive
# a crash:
#   * --capture=no        -> glibc "free(): invalid pointer"-class messages
#                            reach the log instead of dying with the test
#   * LIBC_FATAL_STDERR_=1 -> glibc fatal errors to stderr even when it is
#                            not a tty
#   * PYTHONFAULTHANDLER=1 -> python-level stack on fatal signals
#   * ulimit -c unlimited  -> core files (kernel core_pattern is "core",
#                            dumped into the CWD) for gdb backtraces
#   * MT3D_RETAIN_HOSTMEM  -> A/B the mallopt arena tuning (prime suspect:
#                            arena retention can surface latent heap
#                            corruption that munmap'd blocks masked)
#
# Usage: bash scripts/r4_sigabrt_hunt.sh [N_RUNS] [RETAIN(0|1)]
set -u
cd "$(dirname "$0")/.."
N=${1:-3}
RETAIN=${2:-1}
ulimit -c unlimited
export LIBC_FATAL_STDERR_=1
export PYTHONFAULTHANDLER=1
export MT3D_RETAIN_HOSTMEM=$RETAIN
mkdir -p /tmp/sigabrt_hunt
for i in $(seq 1 "$N"); do
  log=/tmp/sigabrt_hunt/run_retain${RETAIN}_${i}.log
  rm -f core core.*
  start=$(date +%s)
  timeout 2400 python -m pytest tests/ -m slow -q -p no:cacheprovider \
      --capture=no > "$log" 2>&1
  rc=$?
  dur=$(( $(date +%s) - start ))
  echo "run $i retain=$RETAIN rc=$rc ${dur}s" | tee -a /tmp/sigabrt_hunt/summary.txt
  if [ $rc -ge 128 ] || [ $rc -eq 134 ]; then
    core=$(ls core core.* 2>/dev/null | head -1)
    if [ -n "${core:-}" ] && command -v gdb >/dev/null; then
      gdb -batch -ex "thread apply all bt 40" "$(command -v python)" "$core" \
          > "/tmp/sigabrt_hunt/bt_retain${RETAIN}_${i}.txt" 2>&1
      echo "  core backtrace -> bt_retain${RETAIN}_${i}.txt" \
          | tee -a /tmp/sigabrt_hunt/summary.txt
    fi
    tail -40 "$log" | sed 's/^/  | /'
  fi
done
