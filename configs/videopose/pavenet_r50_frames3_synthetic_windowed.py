# Windowed-encoder student on the synthetic-scenes distribution: the
# distillation target config for tools/distill.py (teacher = the parity
# pavenet_r50_frames3_synthetic.py checkpoint).  Evaluate the distilled
# checkpoint with tools/test.py on this config.
_base_ = ['pavenet_r50_frames3_synthetic.py']
model = dict(
    bbox_head=dict(
        transformer=dict(
            encoder=dict(mode='windowed'))))
