# Fine-tune ONLY the refiner on Cityscapes from the u4k V1 checkpoint
# (reference pr_ft_fine_cs.py: load_whole=False keeps the coarse frozen
# at the CS pretrain while the refiner starts from u4k weights).
_base_ = ["./pr_cs.py"]

model = dict(
    config=dict(
        load_whole=False,
        pretrained="./work_dir/zoedepth/u4k/patchrefiner/checkpoint_24",
    ),
)

# reference patchrefiner_zoedepth/pr_ft_fine_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
