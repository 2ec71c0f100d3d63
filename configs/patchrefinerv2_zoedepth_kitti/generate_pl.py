# r128 pseudo-label dump over the KITTI train split with the u4k V2 model
# (reference patchrefinerv2_zoedepth_kitti/generate_pl.py; drive with
# tools/test.py --test-type gen --cai-mode r128).
_base_ = ["../patchrefinerv2_zoedepth/v2_eff_u4k.py"]

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
        transform_cfg=dict(degree=1.0, network_process_size=[384, 512]),
    ),
)

# reference patchrefinerv2_zoedepth_kitti/generate_pl.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
