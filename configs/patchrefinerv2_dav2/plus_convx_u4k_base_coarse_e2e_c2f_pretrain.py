# V2 with DA2 coarse and the convx refiner (reference patchrefinerv2_dav2/
# plus_convx_u4k_base_coarse_e2e_c2f_pretrain.py).
_base_ = ["./plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py"]

model = dict(
    config=dict(
        refiner=dict(
            fine_branch=dict(encoder_name="convnextv2_large.fcmae_ft_in22k_in1k_384"),
            fusion_model=dict(encoder_name="convnextv2_large.fcmae_ft_in22k_in1k_384", fine_chl=[96, 192, 384, 768, 1536]),
        ),
    ),
)

# reference patchrefinerv2_dav2/plus_convx_u4k_base_coarse_e2e_c2f_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
