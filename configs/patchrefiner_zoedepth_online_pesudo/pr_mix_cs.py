# Mixed edge loss: 0.1*ranking + 0.1*SSI (reference pr_mix_cs.py).
_base_ = ["./pr_sigloss_cs.py"]

max_depth = 250

model = dict(
    mix_loss=True,
    ranking_weight=0.1,
    ssi_weight=0.1,
    edgeloss_ranking=dict(
        type="EdgeguidedRankingLoss",
        min_depth=-1e-3,
        max_depth=max_depth,
        alpha=1,
        reweight_target=False,
        only_missing_area=False,
        point_pairs=10000,
    ),
    edgeloss_ssi=dict(
        type="ScaleAndShiftInvariantLoss",
        only_missing_area=False,
        grad_matching=False,
    ),
)

# reference patchrefiner_zoedepth_online_pesudo/pr_mix_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
