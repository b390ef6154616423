#!/usr/bin/env bash
# 512x512 step-decomposition ladder (VERDICT r3 item 7): whole-step A/B at
# batch 4 — aug on/off x fuse_forward on/off x bf16/fp32 — plus a profiler
# trace of the steady-state baseline epoch. One variant per process; the
# tunnel serializes, run this ONLY while no other chip job is active.
#
#   bash scripts/ablate512.sh [outdir=/tmp/ablate512]
set -u
out=${1:-/tmp/ablate512}
mkdir -p "$out"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$out/ladder.log"
  timeout 1500 python -u scripts/probe512.py batch=4 iters=30 "$@" \
    2>&1 | tee "$out/$name.log" | grep -E "steady|RESULT" | tee -a "$out/ladder.log"
}

run base      remat=0 aug=1 fuse=1 dtype=bfloat16
run noaug     remat=0 aug=0 fuse=1 dtype=bfloat16
run nofuse    remat=0 aug=1 fuse=0 dtype=bfloat16
run fp32      remat=0 aug=1 fuse=1 dtype=float32
run remat     remat=1 aug=1 fuse=1 dtype=bfloat16
run trace     remat=0 aug=1 fuse=1 dtype=bfloat16 trace="$out/trace"
echo "=== ladder done ==="; cat "$out/ladder.log"
