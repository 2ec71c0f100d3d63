# Pseudo-label generation over the scannet train split with the DA2-based
# V1 model (reference patchrefiner_dav2/pr_u4k_gen_scannet.py).
_base_ = ["./pr_u4k.py"]

val_dataloader = dict(
    batch_size=1,
    num_workers=1,
    dataset=dict(
        _delete_=True,
        type="ScanNetDataset",
        mode="infer",
        data_root="./data/scannet",
        split="./data/scannet/nvs_sem_train_subset.txt",
        min_depth=1e-3,
        max_depth=80,
        transform_cfg=dict(degree=1.0, network_process_size=[448, 448]),
    ),
)

# reference patchrefiner_dav2/pr_u4k_gen_scannet.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
