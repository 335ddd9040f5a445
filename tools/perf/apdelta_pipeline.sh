#!/bin/bash
# Round-4 windowed-encoder accuracy measurement (VERDICT item 1):
#   1. train the parity (deformable-encoder) teacher on generated
#      synthetic multi-person scenes        -> work_dirs/synth_teacher
#   2. eval the teacher on held-out val     -> AP_teacher
#   3. distill the windowed student from it -> work_dirs/synth_distill
#   4. eval the student on the same val     -> AP_student
# The AP delta bounds the windowed encoder's accuracy cost and goes to
# BASELINE.md.  Run from the repo root on the TPU chip.
set -x
cd "$(dirname "$0")/../.." || exit 1
STEPS=${DISTILL_STEPS:-2000}
GEN=data/synthetic_posetrack
[ -f $GEN/train.json ] || python -m pavenet_tpu.datasets.synthetic --root $GEN || exit 1

python tools/train.py configs/videopose/pavenet_r50_frames3_synthetic.py \
    --work-dir work_dirs/synth_teacher --seed 0 || exit 1
TEACHER=$(ls -d work_dirs/synth_teacher/step_* | sort -V | tail -1)

python tools/test.py configs/videopose/pavenet_r50_frames3_synthetic.py \
    "$TEACHER" --eval keypoints --out work_dirs/synth_teacher/val_results.pkl \
    2>&1 | tee work_dirs/synth_teacher/val_eval.txt

python tools/distill.py \
    configs/videopose/pavenet_r50_frames3_synthetic_windowed.py \
    "$TEACHER" --work-dir work_dirs/synth_distill --steps "$STEPS" || exit 1
STUDENT=$(ls -d work_dirs/synth_distill/step_* work_dirs/synth_distill/final* 2>/dev/null | sort -V | tail -1)

python tools/test.py \
    configs/videopose/pavenet_r50_frames3_synthetic_windowed.py \
    "$STUDENT" --eval keypoints --out work_dirs/synth_distill/val_results.pkl \
    2>&1 | tee work_dirs/synth_distill/val_eval.txt

grep -h "Mean AP\|keypoints_AP" work_dirs/synth_teacher/val_eval.txt \
    work_dirs/synth_distill/val_eval.txt
