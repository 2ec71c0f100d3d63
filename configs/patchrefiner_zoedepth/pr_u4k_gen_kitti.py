# Pseudo-label generation: run the u4k-trained V1 model over the kitti
# TRAIN split and dump r128 uint16 depth maps (reference
# pr_u4k_gen_kitti.py; consumed by the offline-pseudo semi configs via
# pseudo_label_path). Drive with tools/test.py --test-type gen.
_base_ = ["./pr_u4k.py"]

max_depth = 80

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
        max_depth=max_depth,
        transform_cfg=dict(degree=1.0, network_process_size=[384, 512]),
    ),
)

# reference patchrefiner_zoedepth/pr_u4k_gen_kitti.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
