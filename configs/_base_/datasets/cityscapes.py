# Cityscapes loaders (reference configs/_base_/datasets/cityscapes.py).
# 1024x2048 frames, disparity->depth via camera json, max_depth 250,
# random 256x512 crops; val carries seg maps for boundary-F1 eval.
train_dataloader = dict(
    batch_size=4,
    num_workers=4,
    dataset=dict(
        type="CityScapesDataset",
        mode="train",
        data_root="./data/cityscapes",
        split="./data/cityscapes/train.txt",
        min_depth=1e-3,
        max_depth=250,
        patch_raw_shape=[256, 512],
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
        type="CityScapesDataset",
        mode="infer",
        with_seg_map=True,
        data_root="./data/cityscapes",
        split="./data/cityscapes/val.txt",
        min_depth=1e-3,
        max_depth=250,
        transform_cfg=dict(degree=1.0, network_process_size=[384, 512]),
    ),
)
