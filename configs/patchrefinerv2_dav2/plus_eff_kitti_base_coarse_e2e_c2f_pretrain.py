# DA2-coarse V2 on KITTI (reference plus_eff_kitti_base_coarse_e2e_c2f_pretrain.py).
_base_ = ["./plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py", "../_base_/datasets/kitti.py"]

model = dict(
    config=dict(
        image_raw_shape=[352, 1216],
        patch_raw_shape=[176, 304],
        patch_split_num=[2, 4],
    ),
)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[352, 1216],
                                    network_process_size=[448, 448]))
)

# reference patchrefinerv2_dav2/plus_eff_kitti_base_coarse_e2e_c2f_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
