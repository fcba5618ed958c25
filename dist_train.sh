#!/usr/bin/env bash
# Launch training (CLI parity with the reference's dist_train.sh).
# On TPU there is no per-process launcher: one process drives all local
# devices through the jax.sharding mesh; the second argument (device
# count) caps the mesh size.
#   bash dist_train.sh <config> [n_devices] [extra args...]
CONFIG=$1
NDEV=${2:-0}
shift 2 2>/dev/null || shift 1
if [ "$NDEV" -gt 0 ] 2>/dev/null; then
  EXTRA="--batch-size $NDEV"
fi
exec python "$(dirname "$0")/tools/train.py" "$CONFIG" $EXTRA "$@"
