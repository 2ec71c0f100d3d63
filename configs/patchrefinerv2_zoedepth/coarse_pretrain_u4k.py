# ZoeDepth coarse branch pretraining on UnrealStereo4K.
_base_ = [
    "../_base_/datasets/u4k.py",
    "../_base_/run_time.py",
]

min_depth = 1e-3
max_depth = 80

model = dict(
    type="BaselinePretrain",
    target="coarse",
    min_depth=min_depth,
    max_depth=max_depth,
    image_raw_shape=[2160, 3840],
    patch_process_shape=[384, 512],
    patch_split_num=[4, 4],
    coarse_branch=dict(
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
    fine_branch=None,
    sigloss=dict(type="SILogLoss"),
)

collect_input_args = ["image_lr", "depth_gt"]
train_cfg = dict(max_epochs=24, val_interval=2, save_checkpoint_interval=24,
                 log_interval=100, val_type="epoch_base", eval_start=0)
optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=0.000161, weight_decay=0.01),
    clip_grad=dict(type="norm", max_norm=0.1, norm_type=2),
)
param_scheduler = dict(cycle_momentum=True, base_momentum=0.85, max_momentum=0.95,
                       div_factor=2, final_div_factor=100, pct_start=0.3)
