# Fine-tune the WHOLE u4k V1 model on Cityscapes
# (reference pr_ft_whole_cs.py: load_whole=True, u4k depth range).
_base_ = ["./pr_cs.py"]

max_depth = 80

model = dict(
    config=dict(
        max_depth=max_depth,
        load_whole=True,
        pretrained="./work_dir/zoedepth/u4k/patchrefiner/checkpoint_24",
    ),
)

# reference patchrefiner_zoedepth/pr_ft_whole_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
