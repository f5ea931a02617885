#!/usr/bin/env bash
# Scripted sf1 regression guard: run the full bench suite on the 10x
# (1M-event) directory and record the JSON line as a row in SCALING.md
# each round, so the next super-linear regression is caught at 10x
# before it ships. Regenerates the gitignored sf1 copy if absent.
set -e
[ -d /root/repo/tmp/sf1 ] || python3 /root/repo/tools/gen_sf1.py
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/repo/tmp/sf1 exec sbt -batch "runMain graft.Bench"
