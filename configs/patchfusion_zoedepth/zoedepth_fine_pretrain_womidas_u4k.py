# Fine-branch pretraining from a random-initialized BEiT trunk
# (reference zoedepth_fine_pretrain_womidas_u4k.py).
_base_ = ["./zoedepth_fine_pretrain_u4k.py"]

model = dict(fine_branch=dict(use_pretrained_midas=False))

# reference patchfusion_zoedepth/zoedepth_fine_pretrain_womidas_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
