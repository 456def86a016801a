# LOFT + FOA, EXACT 2x recipe on the synthetic BONAI set: 24 epochs,
# step lr [16, 22], linear warmup 300, grad-clip 35 (reference
# configs/_base_/schedules/schedule_2x_bonai.py verbatim), lr linearly
# scaled to the single-chip batch (0.02 is the 16-image value ->
# 0.0025 at global batch 2, the reference auto-scale rule).
_base_ = ['./loft_foa_r50_fpn_synth_bonai.py']

optimizer = dict(type='SGD', lr=0.0025, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='step', warmup='linear', warmup_iters=300,
                 warmup_ratio=0.001, step=[16, 22])
total_epochs = 24
checkpoint_config = dict(interval=4)
