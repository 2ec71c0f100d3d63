# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/plus_mobile_u4k_base_coarse_e2e.py):
# coarse-conditioned, end-to-end coarse, no C2F
_base_ = ["../patchrefinerv2_zoedepth/v2_mobile_u4k.py"]

model = dict(
    config=dict(
        e2e_training=True,
        refiner=dict(
            fine_branch=dict(
                encoder_name="mobilenetv4_conv_small.e2400_r224_in1k",
                coarse_condition=True,
            ),
            fusion_model=dict(
                coarse2fine_type="coarse-gated",
                encoder_name="mobilenetv4_conv_small.e2400_r224_in1k",
                coarse2fine=False,
                fine_chl=[32, 32, 64, 96, 960],
                fine_chl_after_coarse2fine=[32, 32, 32, 64, 96, 960],
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_ablation/plus_mobile_u4k_base_coarse_e2e.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
