# Semi-supervised Cityscapes transfer with an online teacher.
_base_ = ["../_base_/run_time.py"]

min_depth = 1e-3
max_depth = 80

_student = dict(
    type="PatchRefinerPlus",
    config=dict(
        e2e_training=False,
        pretrain_stage=False,
        image_raw_shape=[1024, 2048],
        patch_process_shape=[384, 512],
        patch_raw_shape=[256, 512],
        patch_split_num=[4, 4],
        fusion_feat_level=6,
        min_depth=min_depth,
        max_depth=max_depth,
        strategy_refiner_target="offset_coarse",
        coarse_branch=dict(
            type="ZoeDepth", min_depth=min_depth, max_depth=max_depth,
            midas_model_type="DPT_BEiT_L_384", attractor_alpha=1000,
            attractor_kind="mean", attractor_type="inv",
            bin_centers_type="softplus", n_bins=64, min_temp=0.0212, max_temp=50.0,
        ),
        refiner=dict(
            fine_branch=dict(
                type="LightWeightRefiner", coarse_condition=True,
                with_decoder=False, encoder_name="tf_efficientnet_b5_ap",
            ),
            fusion_model=dict(
                type="BiDirectionalFusion", coarse2fine=True,
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
        remat=True,  # fit bs=4/device in 16G HBM (docs/performance.md)
    ),
)

model = dict(
    type="PatchRefinerSemi",
    model_cfg_student=_student,
    model_cfg_teacher=_student,
    teacher_pretrain=None,
    edgeloss=dict(type="ScaleAndShiftInvariantDALoss", grad_matching=True),
    edge_loss_weight=1.0,
)

train_dataloader = dict(
    batch_size=4,
    dataset=dict(
        type="CityScapesDataset",
        mode="train",
        data_root="./data/cityscapes",
        split="./data/cityscapes/splits/train.txt",
        min_depth=min_depth,
        max_depth=max_depth,
        patch_raw_shape=[256, 512],
        transform_cfg=dict(degree=1.0, random_crop=True,
                           image_raw_shape=[1024, 2048],
                           network_process_size=[384, 512]),
    ),
)

collect_input_args = ["image_lr", "crops_image_hr", "depth_gt", "crop_depths", "bboxs"]
train_cfg = dict(max_epochs=12, val_interval=2, save_checkpoint_interval=12,
                 log_interval=100, val_type="epoch_base", eval_start=0)
optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=0.00012, weight_decay=0.01),
    clip_grad=dict(type="norm", max_norm=35, norm_type=2),
    paramwise_cfg=dict(custom_keys={
        "refiner_fine_branch.refiner_encoder": dict(lr_mult=0.1),
        "coarse_branch": dict(lr_mult=0.1),
    }),
)
param_scheduler = dict(cycle_momentum=True, base_momentum=0.85, max_momentum=0.95,
                       div_factor=2, final_div_factor=100, pct_start=0.3)
