# KITTI leaderboard-test inference for V1 (reference pr_kitti_test.py):
# no gt depth in the loader, save predictions only.
_base_ = ["./pr_kitti.py"]

collect_input_args = [
    "image_lr", "image_hr", "crops_image_hr", "crop_depths", "bboxs", "seg_image",
]

val_dataloader = dict(
    batch_size=1,
    num_workers=1,
    dataset=dict(
        _delete_=True,
        type="KittiDataset",
        mode="infer",
        data_root="./data/kitti_test/image",
        split="./data/kitti_test/split_test.txt",
        min_depth=1e-3,
        max_depth=80,
        transform_cfg=dict(
            degree=1.0,
            network_process_size=[384, 512],
            image_raw_shape=[352, 1216],
        ),
    ),
)

# reference patchrefiner_zoedepth/pr_kitti_test.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
