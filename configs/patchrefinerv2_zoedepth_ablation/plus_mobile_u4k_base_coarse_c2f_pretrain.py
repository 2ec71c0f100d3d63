# Ablation config (reference configs/patchrefinerv2_zoedepth_ablation/plus_mobile_u4k_base_coarse_c2f_pretrain.py):
# coarse-conditioned + C2F (frozen coarse) warm-started from the m0s1 refiner pretrain
_base_ = ["./plus_mobile_u4k_base_coarse_c2f.py"]

model = dict(
    config=dict(pretrained="./work_dir/v2/u4k/pretrain_m0s1/checkpoint_96"),
)

# reference patchrefinerv2_zoedepth_ablation/plus_mobile_u4k_base_coarse_c2f_pretrain.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
