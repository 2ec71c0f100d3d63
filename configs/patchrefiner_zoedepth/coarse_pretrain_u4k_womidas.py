# Coarse pretraining from a random-initialized BEiT trunk (reference
# coarse_pretrain_u4k_womidas.py).
_base_ = ["../patchrefinerv2_zoedepth/coarse_pretrain_u4k.py"]

model = dict(coarse_branch=dict(use_pretrained_midas=False))

# reference patchrefiner_zoedepth/coarse_pretrain_u4k_womidas.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
