# m0s1 refiner pretraining against the DA2 feature widths (reference
# patchrefinerv2_dav2/pretrain_eff_m0s1.py).
_base_ = ["./plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py"]

model = dict(
    config=dict(
        pretrain_stage=True,
        hack_strategy="mean_0_std_1",
        pretrained=None,
        refiner=dict(
            fine_branch=dict(coarse_condition=False, with_decoder=True),
        ),
    ),
)

# reference patchrefinerv2_dav2/pretrain_eff_m0s1.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
