#!/bin/bash
# Tunnel watchdog: probe the TPU with a COMPUTED op in a subprocess (the
# half-up mode registers the platform then hangs on the first executed op —
# CLAUDE.md), and the moment it answers, run the queued on-chip benchmarks
# one at a time (single TPU user rule). Results land in
# benchmarks/results_r05/. Usage: bash benchmarks/tpu_watchdog.sh
set -u
cd /root/repo
OUT=benchmarks/results_r05
mkdir -p "$OUT"
probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones(3).sum()))" >/dev/null 2>&1
}
echo "[watchdog] $(date -u +%H:%M:%S) start"
until probe; do
  echo "[watchdog] $(date -u +%H:%M:%S) tunnel down/hung; retry in 180s"
  sleep 180
done
echo "[watchdog] $(date -u +%H:%M:%S) tunnel UP — running queue"
timeout 3000 python benchmarks/flash_vs_einsum.py 2048 8192 \
  > "$OUT/flash_bf16.log" 2>&1
echo "[watchdog] flash_vs_einsum rc=$?"
echo "[watchdog] $(date -u +%H:%M:%S) done"
