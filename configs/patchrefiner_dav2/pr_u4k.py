# PatchRefiner V1 with Depth-Anything-V2 (vitl) coarse AND fine branches
# at 448x448 (reference configs/patchrefiner_dav2/pr_u4k.py).
_base_ = [
    "../_base_/datasets/u4k.py",
    "../_base_/datasets/general_dataset.py",
    "../_base_/run_time.py",
]

min_depth = 1e-3
max_depth = 80

_da2 = dict(
    type="DA2",
    pretrained="./work_dir/depth_anything_v2_metric_hypersim_vitl",
    model_cfg=dict(encoder="vitl", features=256, out_channels=[256, 512, 1024, 1024]),
)

model = dict(
    type="PatchRefiner",
    config=dict(
        image_raw_shape=[2160, 3840],
        patch_process_shape=[448, 448],
        patch_raw_shape=[540, 960],
        patch_split_num=[4, 4],
        fusion_feat_level=6,
        min_depth=min_depth,
        max_depth=max_depth,
        pretrain_coarse_model="./work_dir/dav2/u4k/coarse_pretrain/checkpoint_24",
        pretrain_fine_model="./work_dir/dav2/u4k/coarse_pretrain/checkpoint_24",
        strategy_refiner_target="offset_coarse",
        coarse_branch=_da2,
        refiner=dict(
            fine_branch=_da2,
            fusion_model=dict(
                type="FusionUnet",
                input_chl=[128 * 2, 256 * 2, 256 * 2, 256 * 2, 256 * 2, 256 * 2],
                temp_chl=[128, 256, 256, 256, 256, 256],
                dec_chl=[256, 256, 256, 256, 128],
            ),
        ),
        sigloss=dict(type="SILogLoss"),
        pretrained=None,
        pre_norm_bbox=True,
    ),
)

collect_input_args = [
    "image_lr", "image_hr", "crops_image_hr", "depth_gt", "crop_depths", "bboxs",
]

project = "patchrefiner"

train_cfg = dict(
    max_epochs=24, val_interval=2, save_checkpoint_interval=24,
    log_interval=100, train_log_img_interval=500, val_log_img_interval=30,
    val_type="epoch_base", eval_start=0,
)

optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=0.00012, weight_decay=0.01),
    clip_grad=dict(type="norm", max_norm=35, norm_type=2),
    paramwise_cfg=dict(
        bypass_duplicate=True,
        custom_keys={
            "refiner_fine_branch.pretrained": dict(lr_mult=1 / 30, decay_mult=1.0),
        },
    ),
)

param_scheduler = dict(
    cycle_momentum=True, base_momentum=0.85, max_momentum=0.95,
    div_factor=2, final_div_factor=100, pct_start=0.3, three_phase=False,
)

train_dataloader = dict(
    batch_size=4,
    num_workers=4,
    dataset=dict(
        transform_cfg=dict(
            image_raw_shape=[2160, 3840], network_process_size=[448, 448],
        ),
    ),
)

val_dataloader = dict(
    dataset=dict(transform_cfg=dict(network_process_size=[448, 448]))
)

# reference patchrefiner_dav2/pr_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
