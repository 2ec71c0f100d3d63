# V1 on u4k WITHOUT pretrained MiDaS weights (reference pr_u4k_womidas.py
# sets use_pretrained_midas=False — here weights always come from the
# converter; a random-initialized BEiT trunk is the default when no
# checkpoint is loaded).
_base_ = ["./pr_u4k.py"]

model = dict(
    config=dict(
        coarse_branch=dict(use_pretrained_midas=False),
        refiner=dict(fine_branch=dict(use_pretrained_midas=False)),
    ),
)

# reference patchrefiner_zoedepth/pr_u4k_womidas.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
