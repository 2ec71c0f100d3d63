# V2 with DA2 coarse and the mobile refiner (reference patchrefinerv2_dav2/
# plus_mobile_u4k_base_coarse_e2e_c2f_pretrain.py).
_base_ = ["./plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py"]

model = dict(
    config=dict(
        refiner=dict(
            fine_branch=dict(encoder_name="mobilenetv4_conv_small.e2400_r224_in1k"),
            fusion_model=dict(encoder_name="mobilenetv4_conv_small.e2400_r224_in1k", fine_chl=[32, 32, 64, 96, 960]),
        ),
    ),
)

# reference patchrefinerv2_dav2/plus_mobile_u4k_base_coarse_e2e_c2f_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
