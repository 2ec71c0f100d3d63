# Cityscapes coarse pretraining warm-started from the u4k coarse
# checkpoint (reference coarse_pretrain_cs_finetune.py).
_base_ = ["./coarse_pretrain_cs.py"]

model = dict(
    coarse_branch=dict(
        pretrained="./work_dir/zoedepth/u4k/coarse_pretrain/checkpoint_24",
    ),
)

# reference patchrefiner_zoedepth/coarse_pretrain_cs_finetune.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
