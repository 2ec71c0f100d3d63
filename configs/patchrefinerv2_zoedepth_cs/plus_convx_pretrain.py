# Cityscapes V2 with the convx refiner (reference
# patchrefinerv2_zoedepth_cs/plus_convx_pretrain.py).
_base_ = ["./plus_eff_cs_pretrain.py"]

model = dict(
    config=dict(
        refiner=dict(
            fine_branch=dict(encoder_name="convnextv2_large.fcmae_ft_in22k_in1k_384"),
            fusion_model=dict(encoder_name="convnextv2_large.fcmae_ft_in22k_in1k_384", fine_chl=[96, 192, 384, 768, 1536]),
        ),
    ),
)

# reference patchrefinerv2_zoedepth_cs/plus_convx_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
