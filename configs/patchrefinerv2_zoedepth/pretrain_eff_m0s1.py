# Refiner pretraining with hacked coarse features (mean 0 / std 1).
_base_ = ["./v2_eff_u4k.py"]

model = dict(
    config=dict(
        pretrain_stage=True,
        hack_strategy="mean_0_std_1",
        refiner=dict(
            fine_branch=dict(
                coarse_condition=False,
                with_decoder=True,
            ),
        ),
    ),
)
