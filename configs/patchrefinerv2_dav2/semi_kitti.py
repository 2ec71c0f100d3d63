# DA2-coarse V2 semi-supervised transfer to KITTI with offline pseudo
# labels (reference patchrefinerv2_dav2/semi_kitti.py).
_base_ = ["./plus_eff_kitti_base_coarse_e2e_c2f_pretrain.py"]

min_depth = 1e-3
max_depth = 80

model = dict(
    _delete_=True,
    type="PatchRefinerSemi",
    model_cfg_student=dict(
        type="PatchRefinerPlus",
        config=dict(
            e2e_training=False,
            image_raw_shape=[352, 1216],
            patch_process_shape=[448, 448],
            patch_raw_shape=[176, 304],
            patch_split_num=[2, 4],
            fusion_feat_level=6,
            min_depth=min_depth,
            max_depth=max_depth,
            strategy_refiner_target="offset_coarse",
            coarse_branch=dict(
                type="DA2",
                model_cfg=dict(encoder="vitl", features=256,
                               out_channels=[256, 512, 1024, 1024]),
            ),
            refiner=dict(
                fine_branch=dict(
                    type="LightWeightRefiner", coarse_condition=True,
                    with_decoder=False, encoder_name="tf_efficientnet_b5_ap",
                ),
                fusion_model=dict(
                    type="BiDirectionalFusion", coarse2fine=True,
                    coarse2fine_type="coarse-gated",
                    coarse_chl=[128, 256, 256, 256, 256, 256],
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
            remat=True,
        ),
    ),
    model_cfg_teacher=None,
    mix_loss=False,
    edge_loss_weight=1,
    edgeloss=dict(type="ScaleAndShiftInvariantLoss",
                  only_missing_area=False, grad_matching=False),
    sigloss=dict(type="SILogLoss"),
    min_depth=min_depth,
    max_depth=max_depth,
)

collect_input_args = [
    "image_lr", "image_hr", "crops_image_hr", "depth_gt", "crop_depths",
    "bboxs", "center_mask", "pseudo_label", "seg_image",
]

train_cfg = dict(max_epochs=3, val_interval=1, save_checkpoint_interval=3,
                 log_interval=100, val_type="epoch_base", eval_start=0)

train_dataloader = dict(
    dataset=dict(
        with_pseudo_label=True,
        pseudo_label_path="./work_dir/v2_dav2/u4k/generate_pls_kitti",
    ),
)

# reference patchrefinerv2_dav2/semi_kitti.py: BN mode under DP (parallel/bn.py)
convert_syncbn = False
