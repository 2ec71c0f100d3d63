# KITTI Eigen-split loaders (reference configs/_base_/datasets/kitti.py;
# split paths made repo-relative). KB-crop 352x1216, patch_raw 176x304.
train_dataloader = dict(
    batch_size=4,
    num_workers=4,
    dataset=dict(
        type="KittiDataset",
        mode="train",
        data_root="./data/kitti",
        split="./data/kitti/kitti_eigen_train_files_with_gt.txt",
        min_depth=1e-3,
        max_depth=80,
        patch_raw_shape=[176, 304],
        transform_cfg=dict(
            degree=1.0,
            random_crop=True,
            network_process_size=[384, 512],
        ),
    ),
)

val_dataloader = dict(
    batch_size=1,
    num_workers=1,
    dataset=dict(
        type="KittiDataset",
        mode="infer",
        data_root="./data/kitti",
        split="./data/kitti/kitti_eigen_test_files_with_gt.txt",
        min_depth=1e-3,
        max_depth=80,
        transform_cfg=dict(degree=1.0, network_process_size=[384, 512]),
    ),
)
