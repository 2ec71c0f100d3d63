# Reference-named alias (reference patchrefinerv2_dav2/
# plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py) of plus_eff_u4k.py.
_base_ = ["./plus_eff_u4k.py"]

model = dict(
    config=dict(
        e2e_training=True,
        pretrained="./work_dir/v2_dav2/u4k/pretrain_m0s1/checkpoint_96",
    ),
)

# reference patchrefinerv2_dav2/plus_eff_u4k_base_coarse_e2e_c2f_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
