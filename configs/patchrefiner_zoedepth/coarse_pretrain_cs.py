# ZoeDepth coarse-branch pretraining on Cityscapes (reference
# coarse_pretrain_cs.py): max_depth 250, OneCycle with flat warmup.
_base_ = [
    "../patchrefinerv2_zoedepth/coarse_pretrain_u4k.py",
    "../_base_/datasets/cityscapes.py",
]

min_depth = 1e-3
max_depth = 250

model = dict(
    min_depth=min_depth,
    max_depth=max_depth,
    image_raw_shape=[1024, 2048],
    coarse_branch=dict(min_depth=min_depth, max_depth=max_depth),
)

collect_input_args = [
    "image_lr", "crops_image_hr", "depth_gt", "crop_depths", "bboxs",
    "image_hr", "seg_image",
]

train_cfg = dict(max_epochs=5, save_checkpoint_interval=5)

optim_wrapper = dict(
    paramwise_cfg=dict(
        bypass_duplicate=True,
        custom_keys={"coarse_branch.core": dict(lr_mult=0.1, decay_mult=1.0)},
    ),
)

param_scheduler = dict(div_factor=1, final_div_factor=10000, pct_start=0.5)

# reference patchrefiner_zoedepth/coarse_pretrain_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
