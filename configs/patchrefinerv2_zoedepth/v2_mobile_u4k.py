# PatchRefinerV2 with the MobileNetV4-small refiner.
_base_ = ["./v2_eff_u4k.py"]

model = dict(
    config=dict(
        refiner=dict(
            fine_branch=dict(
                encoder_name="mobilenetv4_conv_small.e2400_r224_in1k",
            ),
            fusion_model=dict(
                encoder_name="mobilenetv4_conv_small.e2400_r224_in1k",
                fine_chl=[32, 32, 64, 96, 960],
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth/v2_mobile_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
