# Offline SSI-MiDaS transfer on ScanNet++ (reference
# pr_ssi_midas_scannet.py): indoor geometry and depth range.
_base_ = ["./pr_ssi_midas_cs.py", "../_base_/datasets/scannet.py"]

min_depth = 1e-3
max_depth = 10

model = dict(
    model_cfg_student=dict(
        config=dict(
            image_raw_shape=[1440, 1920],
            patch_raw_shape=[720, 960],
            patch_split_num=[2, 2],
            max_depth=max_depth,
        ),
    ),
)

train_dataloader = dict(
    dataset=dict(
        with_pseudo_label=True,
        pseudo_label_path="./work_dir/zoedepth/u4k/patchrefiner/generate_pls_scannet",
        transform_cfg=dict(image_raw_shape=[1440, 1920]),
    ),
)

# reference patchrefiner_zoedepth_offline_pesudo/pr_ssi_midas_scannet.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
