# V2 refiner m0s1 pretraining ("all-patches") on KITTI geometry
# (reference patchrefinerv2_zoedepth_kitti/ap_eff.py): pretrain_stage with
# hacked coarse features, KB-crop 352x1216, 2x4 split.
_base_ = [
    "../patchrefinerv2_zoedepth/v2_eff_u4k.py",
    "../_base_/datasets/kitti.py",
]

model = dict(
    config=dict(
        pretrain_stage=True,
        hack_strategy="mean_0_std_1",
        image_raw_shape=[352, 1216],
        patch_raw_shape=[176, 304],
        patch_split_num=[2, 4],
        pretrain_coarse_model="./work_dir/ZoeDepthv1_kitti",
        refiner=dict(fine_branch=dict(coarse_condition=False, with_decoder=True)),
    ),
)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[352, 1216]))
)

# reference patchrefinerv2_zoedepth_kitti/ap_eff.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
