# PatchFusion with random-initialized BEiT trunks (reference
# zoedepth_patchfusion_womidas_u4k.py).
_base_ = ["./pf_u4k.py"]

model = dict(
    config=dict(
        coarse_branch=dict(use_pretrained_midas=False),
        fine_branch=dict(use_pretrained_midas=False),
    ),
)
