# Flagship PAVE-Net with the opt-in TPU-mode windowed encoder
# (models/layers/windowed.py): dense (8,16)-token window attention per
# pyramid level instead of deformable gathers — 59.6 ms/clip vs 183.5 on
# one v5e at 800x1344 bf16 (PERF_NOTES "windowed encoder").  Non-parity
# design variant: converted reference encoder weights do NOT load;
# retrain via the 3-stage recipe with this config as stage 3.
_base_ = ['pavenet_r50_frames3_posetrack17.py']
model = dict(
    bbox_head=dict(
        transformer=dict(
            encoder=dict(mode='windowed'))))
