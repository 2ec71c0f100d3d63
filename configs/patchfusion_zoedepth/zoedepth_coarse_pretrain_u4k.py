# ZoeDepth coarse pretraining for the PatchFusion pipeline (reference
# zoedepth_coarse_pretrain_u4k.py; identical recipe to the shared
# coarse-pretrain config).
_base_ = ["../patchrefinerv2_zoedepth/coarse_pretrain_u4k.py"]

# reference patchfusion_zoedepth/zoedepth_coarse_pretrain_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
