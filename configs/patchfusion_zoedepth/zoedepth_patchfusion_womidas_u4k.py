# PatchFusion with random-initialized BEiT trunks (reference
# zoedepth_patchfusion_womidas_u4k.py).
_base_ = ["./pf_u4k.py"]

model = dict(
    config=dict(
        coarse_branch=dict(use_pretrained_midas=False),
        fine_branch=dict(use_pretrained_midas=False),
    ),
)

# reference patchfusion_zoedepth/zoedepth_patchfusion_womidas_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
