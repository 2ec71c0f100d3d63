# Supervised V2 on Cityscapes, warm-started from the m0s1 refiner
# pretrain (reference patchrefinerv2_zoedepth_cs/plus_eff_cs_pretrain.py).
_base_ = [
    "../patchrefinerv2_zoedepth/v2_eff_u4k.py",
    "../_base_/datasets/cityscapes.py",
]

min_depth = 1e-3
max_depth = 250

model = dict(
    config=dict(
        image_raw_shape=[1024, 2048],
        patch_raw_shape=[256, 512],
        max_depth=max_depth,
        pretrain_coarse_model="./work_dir/zoedepth/cityscapes/coarse_pretrain/checkpoint_05",
        pretrained="./work_dir/v2/cs/pretrain_m0s1/checkpoint_96",
    ),
)

collect_input_args = [
    "image_lr", "image_hr", "crops_image_hr", "depth_gt", "crop_depths",
    "bboxs", "seg_image",
]

train_cfg = dict(max_epochs=12, val_interval=2, save_checkpoint_interval=12)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[1024, 2048]))
)

# reference patchrefinerv2_zoedepth_cs/plus_eff_cs_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
