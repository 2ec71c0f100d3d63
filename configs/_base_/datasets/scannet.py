# ScanNet++ loaders (reference configs/_base_/datasets/scannet.py; split
# paths made repo-relative). 1440x1920 frames, random 720x960 crops.
train_dataloader = dict(
    batch_size=4,
    num_workers=6,
    dataset=dict(
        type="ScanNetDataset",
        mode="train",
        data_root="./data/scannet",
        split="./data/scannet/nvs_sem_train_subset.txt",
        min_depth=1e-3,
        max_depth=80,
        patch_raw_shape=[720, 960],
        transform_cfg=dict(
            degree=1.0,
            random_crop=True,
            network_process_size=[384, 512],
        ),
    ),
)

val_dataloader = dict(
    batch_size=1,
    num_workers=2,
    dataset=dict(
        type="ScanNetDataset",
        mode="infer",
        data_root="./data/scannet",
        split="./data/scannet/nvs_sem_val.txt",
        min_depth=1e-3,
        max_depth=80,
        transform_cfg=dict(degree=1.0, network_process_size=[384, 512]),
    ),
)
