#!/bin/bash
# Run tools/train.py in auto-resuming segments: the axon tunnel client
# leaks the host copy of every transferred batch (~payload bytes/step,
# PERF_NOTES round 5), so long runs hit the train CLI's --rss-limit-gb
# guard, checkpoint, and exit(3).  This wrapper relaunches until the run
# completes (exit 0) or fails for a real reason.
#
# Usage: bash tools/perf/train_segments.sh CFG [train.py args...]
set -o pipefail
cd "$(dirname "$0")/../.." || exit 1
for seg in $(seq 1 20); do
    python tools/train.py "$@" --auto-resume
    code=$?
    if [ "$code" = 0 ]; then echo "training complete"; exit 0; fi
    if [ "$code" != 3 ]; then echo "training failed ($code)"; exit $code; fi
    echo "segment $seg hit the RSS guard; relaunching"
done
echo "segment cap reached"; exit 1
