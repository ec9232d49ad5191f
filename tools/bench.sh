#!/bin/sh
# Benchmark launcher whose stdout is EXACTLY one line: the Bench JSON.
# sbt -error suppresses [info]/[success] wrappers; the JSON is then read
# from bench_result.json (written atomically by Bench before exit), so a
# truncated pipe can never clip it.
#
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/bench.sh
cd "$(dirname "$0")/.." || exit 1
# Staleness guard: a bench_result.json surviving from an EARLIER success
# must never satisfy this run — delete it up front and require the fresh
# file to exist after a zero exit (r7 verdict task #7).
rm -f bench_result.json
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  sbt -error -batch "runMain graft.Bench" >/dev/null 2>bench_stderr.log
rc=$?
[ $rc -ne 0 ] && { echo "{\"metric\":\"total\",\"value\":-1,\"unit\":\"sec\",\"error\":\"bench exited $rc\"}"; exit $rc; }
[ -f bench_result.json ] || { echo "{\"metric\":\"total\",\"value\":-1,\"unit\":\"sec\",\"error\":\"bench wrote no result file\"}"; exit 1; }
cat bench_result.json
