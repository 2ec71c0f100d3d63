# Online-teacher semi fine-tune with SSI + grad-matching edge loss
# (reference plus_eff_cs_semi_online_ssigm_ft.py; canonical house copy:
# semi_online_cs.py).
_base_ = ["./semi_online_cs.py"]

model = dict(
    edgeloss=dict(
        _delete_=True,
        type="ScaleAndShiftInvariantLoss",
        only_missing_area=False,
        grad_matching=True,
    ),
)

# reference patchrefinerv2_zoedepth_cs/plus_eff_cs_semi_online_ssigm_ft.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
