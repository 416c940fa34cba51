#!/bin/bash
# Usage: scripts/test.sh <run-id> <checkpoint-path> [extra flags]
ID="$1"; CKPT="$2"; shift 2
python -m saunet_tpu.cli.test_and_pack --id "$ID" --checkpoint "$CKPT" "$@"
