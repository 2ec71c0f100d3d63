# Offline-pseudo-label semi fine-tune with SSI + grad matching
# (reference plus_eff_cs_semi_offline_ssigm_ft.py): pseudo labels come
# from a pre-generated r128 dump instead of an online teacher.
_base_ = ["./plus_eff_cs_semi_online_ssigm_ft.py"]

model = dict(model_cfg_teacher=None)

train_dataloader = dict(
    dataset=dict(
        with_pseudo_label=True,
        pseudo_label_path="./work_dir/v2/u4k/generate_pls_cs",
    ),
)

# reference patchrefinerv2_zoedepth_cs/plus_eff_cs_semi_offline_ssigm_ft.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
