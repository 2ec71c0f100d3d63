# Alias of the shared u4k coarse-pretrain recipe (reference keeps it in
# this folder; the canonical copy lives with the V2 configs).
_base_ = ["../patchrefinerv2_zoedepth/coarse_pretrain_u4k.py"]

# reference patchrefiner_zoedepth/coarse_pretrain_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
