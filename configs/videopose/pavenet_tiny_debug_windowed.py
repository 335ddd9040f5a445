# Tiny debug config with the windowed encoder — the distillation student
# counterpart of pavenet_tiny_debug.py, used by the tools/distill.py
# end-to-end CLI test (trains the parity teacher with the base tiny
# config, then distills this student from its checkpoint).
_base_ = ['pavenet_tiny_debug.py']
model = dict(
    bbox_head=dict(
        transformer=dict(
            encoder=dict(mode='windowed'))))
