# V2 refiner m0s1 pretraining ("all-patches") on ScanNet++ geometry
# (reference patchrefinerv2_zoedepth_scannet/ap_eff.py): pretrain_stage with
# hacked coarse features, KB-crop 352x1216, 2x4 split.
_base_ = [
    "../patchrefinerv2_zoedepth/v2_eff_u4k.py",
    "../_base_/datasets/scannet.py",
]

model = dict(
    config=dict(
        max_depth=10,
        pretrain_stage=True,
        hack_strategy="mean_0_std_1",
        image_raw_shape=[1440, 1920],
        patch_raw_shape=[720, 960],
        patch_split_num=[2, 2],
        pretrain_coarse_model="./work_dir/zoedepth/scannet/coarse_pretrain/checkpoint_05",
        refiner=dict(fine_branch=dict(coarse_condition=False, with_decoder=True)),
    ),
)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[1440, 1920]))
)

# reference patchrefinerv2_zoedepth_scannet/ap_eff.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
