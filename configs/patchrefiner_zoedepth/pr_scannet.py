# PatchRefiner V1 on ScanNet++ (reference pr_scannet.py): 1440x1920
# frames, 2x2 split of 720x960 patches, indoor max_depth 10.
_base_ = ["./pr_u4k.py", "../_base_/datasets/scannet.py"]

min_depth = 1e-3
max_depth = 10

model = dict(
    config=dict(
        image_raw_shape=[1440, 1920],
        patch_raw_shape=[720, 960],
        patch_split_num=[2, 2],
        max_depth=max_depth,
        pretrain_coarse_model="./work_dir/zoedepth/scannet/coarse_pretrain/checkpoint_05",
    ),
)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[1440, 1920]))
)

# reference patchrefiner_zoedepth/pr_scannet.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
