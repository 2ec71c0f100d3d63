# PatchRefinerV2 with the ConvNeXt-Large refiner.
_base_ = ["./v2_eff_u4k.py"]

model = dict(
    config=dict(
        refiner=dict(
            fine_branch=dict(
                encoder_name="convnext_large",
                encoder_channels=[96, 192, 384, 768, 1536],
            ),
            fusion_model=dict(
                encoder_name="convnext_large",
                fine_chl=[96, 192, 384, 768, 1536],
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth/v2_convx_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
