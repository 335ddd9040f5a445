#!/bin/bash
# Resume of the apdelta chain after stage 1 (teacher training) has
# already completed: eval the teacher, distill the windowed student,
# eval the student.  DISTILL_STEPS trims the distill schedule to the
# remaining wall clock.  Round 5: small-resolution synthetic recipe
# (configs/videopose/pavenet_r50_frames3_synthetic_sm.py).
set -x
set -o pipefail
cd "$(dirname "$0")/../.." || exit 1
STEPS=${DISTILL_STEPS:-600}
TEACHER=${TEACHER:-$(ls -d work_dirs/synth_teacher_sm/step_* | sort -V | tail -1)}

python tools/test.py configs/videopose/pavenet_r50_frames3_synthetic_sm.py \
    "$TEACHER" --eval keypoints \
    --out work_dirs/synth_teacher_sm/val_results.json \
    2>&1 | tee work_dirs/synth_teacher_sm/val_eval.txt || exit 1

python tools/distill.py \
    configs/videopose/pavenet_r50_frames3_synthetic_sm_windowed.py \
    "$TEACHER" --work-dir work_dirs/synth_distill_sm --steps "$STEPS" \
    --prebaked data/synth_sm/baked || exit 1
STUDENT=$(ls -d work_dirs/synth_distill_sm/step_* 2>/dev/null | sort -V | tail -1)

python tools/test.py \
    configs/videopose/pavenet_r50_frames3_synthetic_sm_windowed.py \
    "$STUDENT" --eval keypoints \
    --out work_dirs/synth_distill_sm/val_results.json \
    2>&1 | tee work_dirs/synth_distill_sm/val_eval.txt || exit 1

grep -h "Mean AP\|keypoints_AP\|posetrack" \
    work_dirs/synth_teacher_sm/val_eval.txt \
    work_dirs/synth_distill_sm/val_eval.txt | tail -40
