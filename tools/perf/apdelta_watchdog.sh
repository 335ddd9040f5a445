#!/bin/bash
# Waits for the TPU (axon tunnel) to come back, then completes the
# windowed-encoder measurement chain unattended:
#   teacher eval -> distill -> student eval -> agreement -> windowed bench
# Results land in work_dirs/ + /tmp/apdelta_watchdog.log; BASELINE.md is
# updated by hand from them.  Round 5: small-resolution synthetic recipe.
set -x
set -o pipefail
cd "$(dirname "$0")/../.." || exit 1
GEN=data/synth_sm

probe() {
    timeout 120 python -c "
import jax
assert jax.devices()[0].platform != 'cpu'
import jax.numpy as jnp
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
" > /dev/null 2>&1
}

for i in $(seq 1 60); do
    if probe; then echo "TPU back after $i probes"; break; fi
    [ "$i" = 60 ] && { echo "TPU never returned"; exit 1; }
    sleep 60
done

DISTILL_STEPS=${DISTILL_STEPS:-600} bash tools/perf/apdelta_resume.sh || exit 1

# guard: both detection files must exist before the agreement stage
for f in work_dirs/synth_teacher_sm/val_results.json \
         work_dirs/synth_distill_sm/val_results.json; do
    [ -s "$f" ] || { echo "missing detections: $f"; exit 1; }
done

python tools/perf/agreement_eval.py $GEN/val.json \
    work_dirs/synth_teacher_sm/val_results.json \
    work_dirs/synth_distill_sm/val_results.json \
    --out work_dirs/synth_distill_sm/agreement.json \
    2>&1 | tee work_dirs/synth_distill_sm/agreement.txt || exit 1

python bench.py --encoder-mode windowed --iters 10 --latency-samples 5 \
    --no-b2 2>&1 | tee work_dirs/bench_windowed.txt
