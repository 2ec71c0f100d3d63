# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/plus_mobile_u4k_base.py):
# refiner only: no coarse condition, no C2F module
_base_ = ["../patchrefinerv2_zoedepth/v2_mobile_u4k.py"]

model = dict(
    config=dict(
        e2e_training=False,
        refiner=dict(
            fine_branch=dict(
                encoder_name="mobilenetv4_conv_small.e2400_r224_in1k",
                coarse_condition=False,
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

# reference patchrefinerv2_zoedepth_ablation/plus_mobile_u4k_base.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
