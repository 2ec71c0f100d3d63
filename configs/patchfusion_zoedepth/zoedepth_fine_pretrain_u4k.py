# ZoeDepth FINE-branch pretraining on u4k patches (reference
# zoedepth_fine_pretrain_u4k.py): BaselinePretrain with target='fine' —
# the net sees high-resolution crops instead of the downsampled image.
_base_ = ["../patchrefinerv2_zoedepth/coarse_pretrain_u4k.py"]

min_depth = 1e-3
max_depth = 80

model = dict(
    target="fine",
    fine_branch=dict(
        type="ZoeDepth",
        min_depth=min_depth,
        max_depth=max_depth,
        midas_model_type="DPT_BEiT_L_384",
        attractor_alpha=1000,
        attractor_kind="mean",
        attractor_type="inv",
        bin_centers_type="softplus",
        n_bins=64,
        min_temp=0.0212,
        max_temp=50.0,
    ),
)

collect_input_args = ["crops_image_hr", "crop_depths", "bboxs"]

# reference patchfusion_zoedepth/zoedepth_fine_pretrain_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
