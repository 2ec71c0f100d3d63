# Edge loss = canny-anchored ordinal ranking loss vs the teacher
# (reference pr_ranking_cs.py).
_base_ = ["./pr_sigloss_cs.py"]

max_depth = 250

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

# reference patchrefiner_zoedepth_online_pesudo/pr_ranking_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
