# V2 trained on real KITTI gt only (reference plus_eff_onlyreal.py):
# the supervised baseline the semi configs compare against.
_base_ = [
    "../patchrefinerv2_zoedepth/v2_eff_u4k.py",
    "../_base_/datasets/kitti.py",
]

model = dict(
    config=dict(
        image_raw_shape=[352, 1216],
        patch_raw_shape=[176, 304],
        patch_split_num=[2, 4],
        pretrain_coarse_model="./work_dir/ZoeDepthv1_kitti",
    ),
)

train_cfg = dict(max_epochs=3, val_interval=1, save_checkpoint_interval=3)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[352, 1216]))
)

# reference patchrefinerv2_zoedepth_kitti/plus_eff_onlyreal.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
