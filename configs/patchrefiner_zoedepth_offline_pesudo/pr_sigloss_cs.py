# V1 synthetic-to-real transfer on Cityscapes with OFFLINE pseudo labels
# (reference patchrefiner_zoedepth_offline_pesudo/pr_sigloss_cs.py): the
# u4k model's r128 depth maps are pre-generated (pr_u4k_gen_cityscape +
# --test-type gen) and loaded by the dataset; no teacher runs at train
# time. Loss variants derive from this file.
_base_ = ["../patchrefiner_zoedepth_online_pesudo/pr_sigloss_cs.py"]

model = dict(model_cfg_teacher=None)

train_dataloader = dict(
    dataset=dict(
        with_pseudo_label=True,
        pseudo_label_path="./work_dir/zoedepth/u4k/patchrefiner/generate_pls_cs",
    ),
)

# reference patchrefiner_zoedepth_offline_pesudo/pr_sigloss_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
