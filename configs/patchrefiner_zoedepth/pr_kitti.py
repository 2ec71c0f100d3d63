# PatchRefiner V1 on KITTI (reference pr_kitti.py): KB-crop 352x1216
# frames, 2x4 split of 176x304 patches.
_base_ = ["./pr_u4k.py", "../_base_/datasets/kitti.py"]

max_depth = 80

model = dict(
    config=dict(
        image_raw_shape=[352, 1216],
        patch_raw_shape=[176, 304],
        patch_split_num=[2, 4],
        pretrain_coarse_model="./work_dir/ZoeDepthv1_kitti",
    ),
)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[352, 1216]))
)

# reference patchrefiner_zoedepth/pr_kitti.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
