# ETH3D loaders (reference configs/_base_/datasets/eth.py; split paths
# made repo-relative). 4032x6048 float32 raw depth, random 540x960 crops.
train_dataloader = dict(
    batch_size=4,
    num_workers=4,
    dataset=dict(
        type="ETHDataset",
        mode="train",
        data_root="./data/eth3d",
        split="./data/eth3d/train.txt",
        min_depth=1e-3,
        max_depth=80,
        patch_raw_shape=[540, 960],
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
        type="ETHDataset",
        mode="infer",
        data_root="./data/eth3d",
        split="./data/eth3d/test.txt",
        min_depth=1e-3,
        max_depth=80,
        transform_cfg=dict(degree=1.0, network_process_size=[384, 512]),
    ),
)
