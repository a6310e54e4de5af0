#!/bin/sh
# Wait for a healthy TPU tunnel, then run the queued perf session once.
#
# Health = TWO consecutive probes, each of which must (a) bring the axon
# backend up AND (b) push a real matmul through the chip and read the
# result back.  The readback matters: the tunnel's observed failure mode
# includes a "flap" state where backend init succeeds but transfers hang
# (docs/PERF.md), and `block_until_ready` can return early through the
# tunnel, so only a value readback proves the path works.
#
# Usage: sh tools/tunnel_watch.sh  (logs to /tmp/tunnel_watch.log)
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"

PROBE='
import sys
import jax
import jax.numpy as jnp
if not any(d.platform == "tpu" for d in jax.devices()):
    sys.exit(3)
x = jnp.ones((2048, 2048), jnp.float32)
v = float((x @ x).sum())
sys.exit(0 if v == 2048.0 ** 3 else 4)
'

i=0
while :; do
    i=$((i + 1))
    if timeout 150 python -c "$PROBE"; then
        echo "$(date -u '+%F %T') probe 1 OK (attempt $i); confirming" \
            >> /tmp/tunnel_watch.log
        sleep 15
        if timeout 150 python -c "$PROBE"; then
            echo "$(date -u '+%F %T') tunnel healthy; starting perf session" \
                >> /tmp/tunnel_watch.log
            sh tools/tpu_perf_session.sh
            rc=$?
            echo "$(date -u '+%F %T') perf session done rc=$rc" \
                >> /tmp/tunnel_watch.log
            exit "$rc"
        fi
    fi
    echo "$(date -u '+%F %T') tunnel not healthy (attempt $i); sleeping 300s" \
        >> /tmp/tunnel_watch.log
    sleep 300
done
