# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/plus_eff_u4k_base_coarse_e2e.py):
# EfficientNet-B5: coarse-conditioned, end-to-end, no C2F
_base_ = ["../patchrefinerv2_zoedepth/v2_eff_u4k.py"]

model = dict(
    config=dict(
        e2e_training=True,
        refiner=dict(
            fine_branch=dict(
                encoder_name="tf_efficientnet_b5_ap",
                coarse_condition=True,
            ),
            fusion_model=dict(
                coarse2fine_type="coarse-gated",
                encoder_name="tf_efficientnet_b5_ap",
                coarse2fine=False,
                fine_chl=[24, 40, 64, 176, 512],
                fine_chl_after_coarse2fine=[32, 24, 40, 64, 176, 512],
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_ablation/plus_eff_u4k_base_coarse_e2e.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
