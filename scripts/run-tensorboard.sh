#!/usr/bin/env bash
# Launch TensorBoard over training runs (reference parity: scripts/run-tensorboard.sh)
tensorboard --logdir "${1:-outputs/runs}" --port "${2:-6006}"
