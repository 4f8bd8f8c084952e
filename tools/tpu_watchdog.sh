#!/bin/bash
# TPU-tunnel watchdog: when the axon relay recovers, run the unattended
# measurement batch (tools/tpu_session.py), regenerate the docs from its
# structured artifacts (tools/post_batch_report.py), and commit.
#
# Arm it detached (survives the arming shell, NOT a machine reboot —
# re-arm from here after one):
#   nohup bash tools/tpu_watchdog.sh > /tmp/tpu_watchdog.log 2>&1 &
#   echo $! > /tmp/tpu_watchdog.pid
# Never run any other python against the tunnel while it is armed unless
# guarded with PALLAS_AXON_POOL_IPS= (empty) — two live tunnel sessions
# wedge the remote compile helper (CLAUDE.md).
#
# Detection: the axon client reaches the TPU only through the loopback
# relay's terminal ports 127.0.0.1:{8083,8093,8103,8113} (root-caused by
# connect() tracing, PLAN.md round-4 session 2); ECONNREFUSED on all four
# = the remote endpoint itself is down, and no client-side quiet helps.
# Poll with a bare TCP SYN every 30 s (costless, holds no session); on
# accept: settle 30 s, one fresh-shape compile probe (20-min cap), then
# the batch.
cd /root/repo
n=0
while true; do
  n=$((n+1))
  open=""
  for p in 8083 8093 8103 8113; do
    if timeout 2 bash -c "</dev/tcp/127.0.0.1/$p" 2>/dev/null; then open=$p; break; fi
  done
  if [ -z "$open" ]; then
    [ $((n % 40)) -eq 1 ] && echo "ports closed (check $n) $(date)"
    sleep 30
    continue
  fi
  echo "PORT $open OPEN at $(date); settling 30s"
  sleep 30
  if timeout 1200 python -c "
import jax, jax.numpy as jnp
n = 241 + $n
x = jnp.ones((n, n + 13))
print('probe ok', float((x @ x.T).sum()), flush=True)
"; then
    echo "TUNNEL RECOVERED at $(date); starting measurement batch"
    timeout 18000 python tools/tpu_session.py 2>&1 | tee /root/repo/artifacts/tpu_session_r4.log
    echo "BATCH EXIT at $(date)"
    cd /root/repo
    PALLAS_AXON_POOL_IPS= python tools/post_batch_report.py
    # one add per path: 'git add a b c' is ATOMIC on pathspec mismatch
    # (one missing file -> fatal, NOTHING staged) and a partially-failed
    # batch legitimately leaves some artifacts unwritten — the ones that
    # DID land must still be committed
    for f in artifacts/tuning.json artifacts/tpu_session_r4.log \
             artifacts/bench_lkg.json artifacts/conformance.json \
             artifacts/conformance_quick.json artifacts/anatomy.json \
             bench_detail.json artifacts/error-maps \
             docs/performance.md README.md; do
      git add -- "$f" 2>/dev/null || true
    done
    git diff --cached --quiet || git commit -m "Round-4 TPU measurement batch: bench, A/B tuning adoption, lit, anatomy, scale, conformance + regenerated docs"
    echo "BATCH COMMITTED; poller exiting"
    exit 0
  fi
  echo "probe failed despite open port at $(date); sleeping 10 min"
  sleep 600
done
