# Pseudo-label generation over KITTI train with the DA2-coarse V2 model
# (reference patchrefinerv2_dav2/plus_u4k_gen_kitti.py).
_base_ = ["./plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py"]

val_dataloader = dict(
    batch_size=1,
    num_workers=1,
    dataset=dict(
        _delete_=True,
        type="KittiDataset",
        mode="infer",
        data_root="./data/kitti",
        split="./data/kitti/kitti_eigen_train_files_with_gt.txt",
        min_depth=1e-3,
        max_depth=80,
        transform_cfg=dict(degree=1.0, network_process_size=[448, 448]),
    ),
)

# reference patchrefinerv2_dav2/plus_u4k_gen_kitti.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
