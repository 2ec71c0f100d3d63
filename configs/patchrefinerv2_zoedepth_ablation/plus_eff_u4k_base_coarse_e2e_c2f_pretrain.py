# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py):
# EfficientNet-B5 full V2 from the m0s1 refiner pretrain
_base_ = ["../patchrefinerv2_zoedepth/v2_eff_u4k.py"]

model = dict(
    config=dict(
        e2e_training=True,
        pretrained="./work_dir/v2/u4k/pretrain_m0s1/checkpoint_96",
        refiner=dict(
            fine_branch=dict(
                encoder_name="tf_efficientnet_b5_ap",
                coarse_condition=True,
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

# reference patchrefinerv2_zoedepth_ablation/plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
