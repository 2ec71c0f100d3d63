# m0s1 refiner pretraining on Cityscapes geometry (reference
# patchrefinerv2_zoedepth_cs/pretrain_eff_cs.py).
_base_ = ["./plus_eff_cs_pretrain.py"]

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

# reference patchrefinerv2_zoedepth_cs/pretrain_eff_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
