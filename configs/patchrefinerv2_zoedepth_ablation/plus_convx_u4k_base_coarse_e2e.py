# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/plus_convx_u4k_base_coarse_e2e.py):
# ConvNeXtV2-L: coarse-conditioned, end-to-end, no C2F
_base_ = ["../patchrefinerv2_zoedepth/v2_convx_u4k.py"]

model = dict(
    config=dict(
        e2e_training=True,
        refiner=dict(
            fine_branch=dict(
                encoder_name="convnextv2_large.fcmae_ft_in22k_in1k_384",
                coarse_condition=True,
            ),
            fusion_model=dict(
                coarse2fine_type="coarse-gated",
                encoder_name="convnextv2_large.fcmae_ft_in22k_in1k_384",
                coarse2fine=False,
                fine_chl=[96, 192, 384, 768, 1536],
                fine_chl_after_coarse2fine=[32, 96, 192, 384, 768, 1536],
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_ablation/plus_convx_u4k_base_coarse_e2e.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
