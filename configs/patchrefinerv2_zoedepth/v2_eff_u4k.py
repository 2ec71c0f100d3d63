# PatchRefinerV2 flagship: ZoeDepth (BEiT-L MiDaS) coarse + EfficientNet-B5
# refiner + BiDirectionalFusion on UnrealStereo4K.
_base_ = [
    "../_base_/datasets/u4k.py",
    "../_base_/datasets/general_dataset.py",
    "../_base_/run_time.py",
]

min_depth = 1e-3
max_depth = 80

zoe_depth_config = dict(
    type="ZoeDepth",
    min_depth=min_depth,
    max_depth=max_depth,
    midas_model_type="DPT_BEiT_L_384",
    train_midas=True,
    freeze_midas_bn=True,
    do_resize=False,
    attractor_alpha=1000,
    attractor_gamma=2,
    attractor_kind="mean",
    attractor_type="inv",
    bin_centers_type="softplus",
    bin_embedding_dim=128,
    img_size=[384, 512],
    max_temp=50.0,
    min_temp=0.0212,
    n_attractors=[16, 8, 4, 1],
    n_bins=64,
)

model = dict(
    type="PatchRefinerPlus",
    config=dict(
        e2e_training=True,
        pretrain_stage=False,
        image_raw_shape=[2160, 3840],
        patch_process_shape=[384, 512],
        patch_raw_shape=[540, 960],
        patch_split_num=[4, 4],
        fusion_feat_level=6,
        min_depth=min_depth,
        max_depth=max_depth,
        pretrain_coarse_model=None,
        strategy_refiner_target="offset_coarse",
        coarse_branch=zoe_depth_config,
        refiner=dict(
            fine_branch=dict(
                type="LightWeightRefiner",
                coarse_condition=True,
                with_decoder=False,
                encoder_name="tf_efficientnet_b5_ap",
            ),
            fusion_model=dict(
                type="BiDirectionalFusion",
                encoder_name="tf_efficientnet_b5_ap",
                coarse2fine=True,
                coarse2fine_type="coarse-gated",
                coarse_chl=[32, 256, 256, 256, 256, 256],
                fine_chl=[24, 40, 64, 176, 512],
                fine_chl_after_coarse2fine=[32, 256, 256, 256, 256, 256],
                temp_chl=[32, 64, 64, 128, 256, 512],
                dec_chl=[512, 256, 128, 64, 32],
            ),
        ),
        sigloss=dict(type="SILogLoss"),
        gmloss=dict(type="GradMatchLoss"),
        sigweight=1,
        pre_norm_bbox=True,
        # rematerialize refiner+fusion in backward: the reference's
        # bs=4/device recipe needs 17.1G without it (v5e HBM = 15.75G)
        remat=True,
        pretrained=None,
        whole_pretrained=None,
    ),
)

collect_input_args = [
    "image_lr", "image_hr", "crops_image_hr", "depth_gt", "crop_depths", "bboxs",
]

project = "patchrefinerplus"

train_cfg = dict(
    max_epochs=48,
    val_interval=4,
    save_checkpoint_interval=24,
    log_interval=100,
    train_log_img_interval=500,
    val_log_img_interval=6,
    val_type="epoch_base",
    eval_start=0,
)

optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=0.00012, weight_decay=0.01),
    clip_grad=dict(type="norm", max_norm=35, norm_type=2),
    paramwise_cfg=dict(
        bypass_duplicate=True,
        custom_keys={
            "refiner_fine_branch.refiner_encoder": dict(lr_mult=0.1, decay_mult=1.0),
            "coarse_branch": dict(lr_mult=0.1, decay_mult=1.0),
        },
    ),
)

param_scheduler = dict(
    cycle_momentum=True,
    base_momentum=0.85,
    max_momentum=0.95,
    div_factor=2,
    final_div_factor=100,
    pct_start=0.3,
    three_phase=False,
)

train_dataloader = dict(
    batch_size=4,
    num_workers=4,
    dataset=dict(transform_cfg=dict(image_raw_shape=[2160, 3840])),
)

# reference patchrefinerv2_zoedepth/v2_eff_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
