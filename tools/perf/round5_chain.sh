#!/bin/bash
# Round-5 completion chain: wait for the segmented teacher training to
# finish, then run the full accuracy measurement + benches unattended.
#   teacher eval -> distill (prebaked) -> student eval -> agreement
#   -> bench (parity + train-step) -> bench (windowed, fused pallas)
#   -> bench (windowed, xla) for the kernel-vs-XLA comparison
set -x
set -o pipefail
cd "$(dirname "$0")/../.." || exit 1

# wait for the training wrapper (train_segments.sh) to exit
while pgrep -f "tools/perf/train_segments.sh" > /dev/null; do sleep 60; done
grep -q "training complete" /tmp/teacher_seg.log || {
    echo "training did not complete cleanly; continuing with latest ckpt"; }

DISTILL_STEPS=${DISTILL_STEPS:-800} bash tools/perf/apdelta_resume.sh \
    2>&1 | tee work_dirs/apdelta_r5.log || exit 1

python tools/perf/agreement_eval.py data/synth_sm/val.json \
    work_dirs/synth_teacher_sm/val_results.json \
    work_dirs/synth_distill_sm/val_results.json \
    --out work_dirs/synth_distill_sm/agreement.json \
    2>&1 | tee work_dirs/synth_distill_sm/agreement.txt || exit 1

python bench.py 2>&1 | tee work_dirs/bench_parity_r5.txt
python bench.py --encoder-mode windowed --iters 10 --latency-samples 5 \
    --no-b2 2>&1 | tee work_dirs/bench_windowed_pallas_r5.txt
PAVENET_WINDOW_ATTN=xla python bench.py --encoder-mode windowed \
    --iters 10 --latency-samples 5 --no-b2 --no-train \
    2>&1 | tee work_dirs/bench_windowed_xla_r5.txt
echo "ROUND5 CHAIN DONE"
