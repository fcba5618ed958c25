#!/usr/bin/env bash
# Launch inference (CLI parity with the reference's dist_test.sh).
#   bash dist_test.sh <config> <checkpoint> [n_devices] [extra args...]
CONFIG=$1
CKPT=$2
shift 3 2>/dev/null || shift 2
exec python "$(dirname "$0")/tools/test.py" "$CONFIG" "$CKPT" "$@"
