# V1 synthetic-to-real transfer on Cityscapes with an ONLINE teacher
# (reference patchrefiner_zoedepth_online_pesudo/pr_sigloss_cs.py): the
# frozen u4k-trained V1 teacher predicts pseudo labels per step; the
# Cityscapes student trains with SILog on real gt + SILog edge loss on
# the teacher prediction. Loss variants derive from this file.
_base_ = [
    "../_base_/datasets/cityscapes.py",
    "../_base_/datasets/general_dataset.py",
    "../_base_/run_time.py",
    "./base_pr_s2r_optim.py",
]

min_depth = 1e-3
max_depth = 250

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

_fusion_unet = dict(
    type="FusionUnet",
    input_chl=[32 * 2, 256 * 2, 256 * 2, 256 * 2, 256 * 2, 256 * 2],
    temp_chl=[32, 256, 256, 256, 256, 256],
    dec_chl=[256, 256, 256, 256, 32],
)

model_cfg_student = dict(
    type="PatchRefiner",
    config=dict(
        image_raw_shape=[1024, 2048],
        patch_process_shape=[384, 512],
        patch_raw_shape=[256, 512],
        patch_split_num=[4, 4],
        fusion_feat_level=6,
        min_depth=min_depth,
        max_depth=max_depth,
        pretrain_fine_model=None,
        pretrain_coarse_model="./work_dir/pr_zoedepth/cityscapes/coarse_pretrain/checkpoint_05",
        strategy_refiner_target="offset_coarse",
        coarse_branch=zoe_depth_config,
        refiner=dict(fine_branch=zoe_depth_config, fusion_model=_fusion_unet),
        sigloss=dict(type="SILogLoss"),
        load_whole=True,
        pretrained="./work_dir/pr_zoedepth/cityscapes/pr/checkpoint_05",
        pre_norm_bbox=True,
    ),
)

_zoe_teacher = dict(zoe_depth_config)
model_cfg_teacher = dict(
    type="PatchRefiner",
    config=dict(
        image_raw_shape=[1024, 2048],
        patch_process_shape=[384, 512],
        patch_raw_shape=[256, 512],
        patch_split_num=[4, 4],
        fusion_feat_level=6,
        min_depth=min_depth,
        max_depth=max_depth,
        pretrain_fine_model=None,
        pretrain_coarse_model="./work_dir/pr_zoedepth/u4k/coarse_pretrain/checkpoint_24",
        strategy_refiner_target="offset_coarse",
        coarse_branch=_zoe_teacher,
        refiner=dict(fine_branch=_zoe_teacher, fusion_model=_fusion_unet),
        sigloss=dict(type="SILogLoss"),
        load_whole=True,
        pretrained="./work_dir/pr_zoedepth/u4k/patchrefiner/checkpoint_24",
        pre_norm_bbox=True,
    ),
)

model = dict(
    type="PatchRefinerSemi",
    model_cfg_student=model_cfg_student,
    model_cfg_teacher=model_cfg_teacher,
    mix_loss=False,
    edge_loss_weight=1,
    edgeloss=dict(type="SILogLoss"),
    sigloss=dict(type="SILogLoss"),
    min_depth=min_depth,
    max_depth=max_depth,
)

collect_input_args = [
    "image_lr", "image_hr", "crops_image_hr", "depth_gt", "crop_depths",
    "bboxs", "center_mask", "pseudo_label", "seg_image",
]

project = "patchrefiner"

train_cfg = dict(
    max_epochs=2, val_interval=1, save_checkpoint_interval=2,
    log_interval=100, train_log_img_interval=1000, val_log_img_interval=50,
    val_type="epoch_base", eval_start=0,
)

train_dataloader = dict(
    dataset=dict(transform_cfg=dict(image_raw_shape=[1024, 2048]))
)

# reference patchrefiner_zoedepth_online_pesudo/pr_sigloss_cs.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
