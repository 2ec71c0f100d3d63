# Online-teacher semi fine-tune with the edge-guided ranking loss
# (reference plus_eff_cs_semi_online_ranking_ft.py).
_base_ = ["./semi_online_cs.py"]

max_depth = 80

model = dict(
    edgeloss=dict(
        _delete_=True,
        type="EdgeguidedRankingLoss",
        min_depth=1e-3,
        max_depth=max_depth,
        alpha=1,
        reweight_target=False,
        only_missing_area=False,
        point_pairs=10000,
    ),
)

# reference patchrefinerv2_zoedepth_cs/plus_eff_cs_semi_online_ranking_ft.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
