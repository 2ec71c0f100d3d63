# Cityscapes V2 with the mobile refiner (reference
# patchrefinerv2_zoedepth_cs/plus_mobile_cs_pretrain.py).
_base_ = ["./plus_eff_cs_pretrain.py"]

model = dict(
    config=dict(
        refiner=dict(
            fine_branch=dict(encoder_name="mobilenetv4_conv_small.e2400_r224_in1k"),
            fusion_model=dict(encoder_name="mobilenetv4_conv_small.e2400_r224_in1k", fine_chl=[32, 32, 64, 96, 960]),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_cs/plus_mobile_cs_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
