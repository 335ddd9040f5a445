#!/bin/bash
# Resume of apdelta_pipeline.sh after stage 1 (teacher training) has
# already completed: eval the teacher, distill the windowed student,
# eval the student.  DISTILL_STEPS trims the distill schedule to the
# remaining wall clock.
set -x
set -o pipefail
cd "$(dirname "$0")/../.." || exit 1
STEPS=${DISTILL_STEPS:-600}
TEACHER=$(ls -d work_dirs/synth_teacher/step_* | sort -V | tail -1)

python tools/test.py configs/videopose/pavenet_r50_frames3_synthetic.py \
    "$TEACHER" --eval keypoints --out work_dirs/synth_teacher/val_results.json \
    2>&1 | tee work_dirs/synth_teacher/val_eval.txt || exit 1

python tools/distill.py \
    configs/videopose/pavenet_r50_frames3_synthetic_windowed.py \
    "$TEACHER" --work-dir work_dirs/synth_distill --steps "$STEPS" || exit 1
STUDENT=$(ls -d work_dirs/synth_distill/step_* work_dirs/synth_distill/final* 2>/dev/null | sort -V | tail -1)

python tools/test.py \
    configs/videopose/pavenet_r50_frames3_synthetic_windowed.py \
    "$STUDENT" --eval keypoints --out work_dirs/synth_distill/val_results.json \
    2>&1 | tee work_dirs/synth_distill/val_eval.txt || exit 1

grep -h "Mean AP\|keypoints_AP\|posetrack" work_dirs/synth_teacher/val_eval.txt \
    work_dirs/synth_distill/val_eval.txt | tail -40
