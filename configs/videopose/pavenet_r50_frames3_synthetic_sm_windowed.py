# Windowed-encoder student counterpart of the small-resolution synthetic
# teacher recipe: distill with
#   python tools/distill.py \
#       configs/videopose/pavenet_r50_frames3_synthetic_sm_windowed.py \
#       work_dirs/synth_teacher_sm/step_N
# then eval both with tools/test.py and score agreement with
# tools/perf/agreement_eval.py (BASELINE.md "windowed-encoder accuracy").
_base_ = ['pavenet_r50_frames3_synthetic_sm.py']
model = dict(
    bbox_head=dict(
        transformer=dict(
            encoder=dict(mode='windowed'))))
