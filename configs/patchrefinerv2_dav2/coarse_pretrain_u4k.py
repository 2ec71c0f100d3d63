# Depth-Anything-V2 (vitl) coarse pretraining on u4k (reference
# patchrefinerv2_dav2/coarse_pretrain_u4k.py).
_base_ = [
    "../_base_/datasets/u4k.py",
    "../_base_/datasets/general_dataset.py",
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
    patch_process_shape=[448, 448],
    patch_split_num=[4, 4],
    coarse_branch=dict(
        type="DA2",
        pretrained="./work_dir/depth_anything_v2_metric_hypersim_vitl",
        model_cfg=dict(encoder="vitl", features=256,
                       out_channels=[256, 512, 1024, 1024]),
    ),
    fine_branch=None,
    sigloss=dict(type="SILogLoss"),
)

collect_input_args = ["image_lr", "depth_gt"]
project = "patchrefinerplus"

train_cfg = dict(max_epochs=12, val_interval=2, save_checkpoint_interval=12,
                 log_interval=100, val_type="epoch_base", eval_start=0)
optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=0.000161, weight_decay=0.01),
    clip_grad=dict(type="norm", max_norm=0.1, norm_type=2),
)
param_scheduler = dict(cycle_momentum=True, base_momentum=0.85, max_momentum=0.95,
                       div_factor=1, final_div_factor=10000, pct_start=0.5)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(network_process_size=[448, 448]))
)
val_dataloader = dict(
    dataset=dict(transform_cfg=dict(network_process_size=[448, 448]))
)

# reference patchrefinerv2_dav2/coarse_pretrain_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
