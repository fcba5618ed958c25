#!/usr/bin/env bash
# Launch inference (CLI parity with the reference's dist_test.sh).
#   bash dist_test.sh <config> <checkpoint> [n_devices] [extra args...]
# n_devices > 1 shards the val scenes over the first N chips (the
# reference's multi_gpu_test scene sharding, test.py:205-214).
CONFIG=$1
CKPT=$2
NDEV=${3:-1}
shift 3 2>/dev/null || shift 2
exec python "$(dirname "$0")/tools/test.py" "$CONFIG" "$CKPT" \
    --n-devices "$NDEV" "$@"
