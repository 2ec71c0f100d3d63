# Legacy PatchFusion: frozen coarse+fine ZoeDepth pair + guided fusion.
_base_ = [
    "../_base_/datasets/u4k.py",
    "../_base_/run_time.py",
]

min_depth = 1e-3
max_depth = 80

zoe = dict(
    type="ZoeDepth", min_depth=min_depth, max_depth=max_depth,
    midas_model_type="DPT_BEiT_L_384", attractor_alpha=1000,
    attractor_kind="mean", attractor_type="inv", bin_centers_type="softplus",
    n_bins=64, bin_embedding_dim=128, n_attractors=[16, 8, 4, 1],
    min_temp=0.0212, max_temp=50.0,
)

model = dict(
    type="PatchFusion",
    config=dict(
        image_raw_shape=[2160, 3840],
        patch_process_shape=[384, 512],
        patch_split_num=[4, 4],
        min_depth=min_depth,
        max_depth=max_depth,
        coarse_branch=zoe,
        fine_branch=zoe,
        load_branch=False,
        pretrain_model=[None, None],
        guided_fusion=dict(
            type="GuidedFusionPatchFusion",
            n_channels=5,
            g2l=True,
            in_channels=[32, 256, 256, 256, 256, 256],
            depth=[2, 2, 3, 3, 4, 4],
            num_heads=[8, 8, 16, 16, 32, 32],
            num_patches=[384 * 512, 192 * 256, 96 * 128, 48 * 64, 24 * 32, 12 * 16],
        ),
        sigloss=dict(type="SILogLoss"),
        pre_norm_bbox=True,
    ),
)

collect_input_args = ["image_lr", "image_hr", "crops_image_hr", "depth_gt", "crop_depths", "bboxs"]
train_cfg = dict(max_epochs=16, val_interval=2, save_checkpoint_interval=16,
                 log_interval=100, val_type="epoch_base", eval_start=0)
optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=0.0002, weight_decay=0.01),
    clip_grad=dict(type="norm", max_norm=0.1, norm_type=2),
)
param_scheduler = dict(cycle_momentum=True, base_momentum=0.85, max_momentum=0.95,
                       div_factor=2, final_div_factor=100, pct_start=0.3)
