# Edge loss = MiDaS-style scale/shift-invariant loss on the teacher
# prediction (reference pr_ssi_midas_cs.py).
_base_ = ["./pr_sigloss_cs.py"]

model = dict(
    edgeloss=dict(
        _delete_=True,
        type="ScaleAndShiftInvariantLoss",
        only_missing_area=False,
        grad_matching=False,
    ),
)

# reference patchrefiner_zoedepth_online_pesudo/pr_ssi_midas_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
