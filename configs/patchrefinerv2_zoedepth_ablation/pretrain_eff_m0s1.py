# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/pretrain_eff_m0s1.py):
# refiner m0s1 pretraining, EfficientNet-B5
_base_ = ["../patchrefinerv2_zoedepth/v2_eff_u4k.py"]

model = dict(
    config=dict(
        e2e_training=True,
        pretrain_stage=True,
        hack_strategy="mean_0_std_1",
        refiner=dict(
            fine_branch=dict(
                encoder_name="tf_efficientnet_b5_ap",
                coarse_condition=False,
                with_decoder=True,
            ),
            fusion_model=dict(
                coarse2fine_type="coarse-gated",
                encoder_name="tf_efficientnet_b5_ap",
                coarse2fine=True,
                fine_chl=[24, 40, 64, 176, 512],
                fine_chl_after_coarse2fine=[32, 256, 256, 256, 256, 256],
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_ablation/pretrain_eff_m0s1.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
