# Edge loss = Depth-Anything-style mean/std-aligned SSI loss
# (reference pr_ssi_da_cs.py).
_base_ = ["./pr_sigloss_cs.py"]

model = dict(
    edgeloss=dict(
        _delete_=True,
        type="ScaleAndShiftInvariantDALoss",
        only_missing_area=False,
        grad_matching=False,
    ),
)

# reference patchrefiner_zoedepth_online_pesudo/pr_ssi_da_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
