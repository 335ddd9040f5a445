#!/usr/bin/env bash
# Multi-host eval launcher (reference surface: tools/dist_test.sh).
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")"/test.py "$CONFIG" "$CHECKPOINT" "$@"
