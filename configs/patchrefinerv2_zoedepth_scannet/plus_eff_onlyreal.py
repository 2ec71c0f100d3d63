# V2 trained on real ScanNet++ gt only (reference plus_eff_onlyreal.py):
# the supervised baseline the semi configs compare against.
_base_ = [
    "../patchrefinerv2_zoedepth/v2_eff_u4k.py",
    "../_base_/datasets/scannet.py",
]

model = dict(
    config=dict(
        max_depth=10,
        image_raw_shape=[1440, 1920],
        patch_raw_shape=[720, 960],
        patch_split_num=[2, 2],
        pretrain_coarse_model="./work_dir/zoedepth/scannet/coarse_pretrain/checkpoint_05",
    ),
)

train_cfg = dict(max_epochs=3, val_interval=1, save_checkpoint_interval=3)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[1440, 1920]))
)

# reference patchrefinerv2_zoedepth_scannet/plus_eff_onlyreal.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
