# Offline SSI-MiDaS transfer on KITTI (reference pr_ssi_midas_kitti.py):
# KB-crop geometry, pseudo labels from pr_u4k_gen_kitti.
_base_ = ["./pr_ssi_midas_cs.py", "../_base_/datasets/kitti.py"]

min_depth = 1e-3
max_depth = 80

model = dict(
    model_cfg_student=dict(
        config=dict(
            image_raw_shape=[352, 1216],
            patch_raw_shape=[176, 304],
            patch_split_num=[2, 4],
            max_depth=max_depth,
            pretrain_coarse_model="./work_dir/ZoeDepthv1_kitti",
        ),
    ),
)

train_dataloader = dict(
    dataset=dict(
        with_pseudo_label=True,
        pseudo_label_path="./work_dir/zoedepth/u4k/patchrefiner/generate_pls_kitti",
        transform_cfg=dict(image_raw_shape=[352, 1216]),
    ),
)

# reference patchrefiner_zoedepth_offline_pesudo/pr_ssi_midas_kitti.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
