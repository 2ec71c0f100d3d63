# DA2 coarse pretraining on KITTI (reference coarse_pretrain_kitti.py).
_base_ = ["./coarse_pretrain_u4k.py", "../_base_/datasets/kitti.py"]

model = dict(image_raw_shape=[352, 1216], patch_split_num=[2, 4])

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[352, 1216],
                                    network_process_size=[448, 448]))
)

# reference patchrefinerv2_dav2/coarse_pretrain_kitti.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
