#!/bin/bash
# Session on-chip work queue (see docs/ROADMAP.md "standing work queue").
#
# The axon relay to the TPU can be hard-down for hours (backend init blocks
# ~25 min per attempt, then raises UNAVAILABLE).  This script probes the
# backend in FRESH subprocesses (jax caches an init failure in-process) in
# a loop — each failed probe returns naturally after ~25 min; never kill a
# probe mid-setup, that wedges the remote compile service — and the moment
# a probe succeeds it runs the measurement queue in order:
#
#   bench.py -> warm-cache cold-start -> tilemajor extraction A/B ->
#   per-config sweep (incl. DEF) -> sustained 4,000-pair run
#
# Usage:  ONCHIP_OUT=/tmp/onchip bash tools/onchip_queue.sh
# Logs:   $ONCHIP_OUT/queue.log (timeline), per-job .out/.err files.
set -u
OUT=${ONCHIP_OUT:-/tmp/onchip}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/torchpiv_jaxcache}

log() { echo "[$(date -u '+%F %T')] $*" >> "$OUT/queue.log"; }

log "queue armed (pid $$)"
attempt=0
while true; do
  attempt=$((attempt + 1))
  t0=$SECONDS
  if python -c 'import jax; print("PROBE_OK", jax.devices(), flush=True)' \
      >> "$OUT/probe.log" 2>&1; then
    log "backend UP (probe $attempt, $((SECONDS - t0)) s)"
    break
  fi
  log "probe $attempt failed after $((SECONDS - t0)) s; sleeping 60"
  sleep 60
done

run() {
  name=$1; shift
  log "START $name: $*"
  "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$? -> $OUT/$name.json"
}

run bench      python bench.py
run coldstart  python tools/coldstart.py
run tilemajor  python tools/bench_engine_ab.py extract_variant=stack extract_variant=tilemajor
run sweep      python tools/bench_sweep.py
run sustained  python tools/sustained_run.py
log "queue done"
