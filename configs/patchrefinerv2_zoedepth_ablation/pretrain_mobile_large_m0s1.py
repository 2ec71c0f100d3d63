# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/pretrain_mobile_large_m0s1.py):
# refiner m0s1 pretraining, MobileNetV4-large
_base_ = ["../patchrefinerv2_zoedepth/v2_mobile_u4k.py"]

model = dict(
    config=dict(
        e2e_training=True,
        pretrain_stage=True,
        hack_strategy="mean_0_std_1",
        refiner=dict(
            fine_branch=dict(
                encoder_name="mobilenetv4_conv_large.e600_r384_in1k",
                coarse_condition=False,
                with_decoder=True,
            ),
            fusion_model=dict(
                coarse2fine_type="coarse-gated",
                encoder_name="mobilenetv4_conv_large.e600_r384_in1k",
                coarse2fine=True,
                fine_chl=[24, 48, 96, 192, 960],
                fine_chl_after_coarse2fine=[32, 256, 256, 256, 256, 256],
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_ablation/pretrain_mobile_large_m0s1.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
