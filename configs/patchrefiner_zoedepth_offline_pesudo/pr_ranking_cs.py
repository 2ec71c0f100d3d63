# Offline-pseudo-label variant of pr_ranking_cs (reference
# patchrefiner_zoedepth_offline_pesudo/pr_ranking_cs.py): same edge loss as
# the online config, pseudo labels read from disk instead of a teacher.
_base_ = ["../patchrefiner_zoedepth_online_pesudo/pr_ranking_cs.py"]

model = dict(model_cfg_teacher=None)

train_dataloader = dict(
    dataset=dict(
        with_pseudo_label=True,
        pseudo_label_path="./work_dir/zoedepth/u4k/patchrefiner/generate_pls_cs",
    ),
)

# reference patchrefiner_zoedepth_offline_pesudo/pr_ranking_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
