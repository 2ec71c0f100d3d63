# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/plus_mobile_u4k_base_coarse_heavy.py):
# heavy-conv fusion head, no C2F
_base_ = ["../patchrefinerv2_zoedepth/v2_mobile_u4k.py"]

model = dict(
    config=dict(
        e2e_training=False,
        refiner=dict(
            fine_branch=dict(
                encoder_name="mobilenetv4_conv_small.e2400_r224_in1k",
                coarse_condition=True,
            ),
            fusion_model=dict(
                _delete_=True,
                type="BiDirectionalFusionHeavy",
                coarse2fine_type="coarse-gated",
                coarse_chl=[32, 256, 256, 256, 256, 256],
                temp_chl=[32, 64, 64, 128, 256, 512],
                dec_chl=[512, 256, 128, 64, 32],
                encoder_name="mobilenetv4_conv_small.e2400_r224_in1k",
                coarse2fine=False,
                fine_chl=[32, 32, 64, 96, 960],
                fine_chl_after_coarse2fine=[32, 32, 32, 64, 96, 960],
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_ablation/plus_mobile_u4k_base_coarse_heavy.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
