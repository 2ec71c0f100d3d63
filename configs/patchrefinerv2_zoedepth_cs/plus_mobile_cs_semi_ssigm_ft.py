# MobileNetV4-small semi fine-tune with SSI + grad matching
# (reference plus_mobile_cs_semi_ssigm_ft.py).
_base_ = ["./plus_eff_cs_semi_online_ssigm_ft.py"]

_enc = "mobilenetv4_conv_small.e2400_r224_in1k"

model = dict(
    model_cfg_student=dict(
        config=dict(
            refiner=dict(
                fine_branch=dict(encoder_name=_enc),
                fusion_model=dict(encoder_name=_enc,
                                  fine_chl=[32, 32, 64, 96, 960]),
            ),
        ),
    ),
    model_cfg_teacher=dict(
        config=dict(
            refiner=dict(
                fine_branch=dict(encoder_name=_enc),
                fusion_model=dict(encoder_name=_enc,
                                  fine_chl=[32, 32, 64, 96, 960]),
            ),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_cs/plus_mobile_cs_semi_ssigm_ft.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
