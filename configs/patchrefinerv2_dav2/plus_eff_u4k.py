# PatchRefinerV2 with a Depth-Anything-V2 (vitl) coarse branch at 448x448.
_base_ = ["../patchrefinerv2_zoedepth/v2_eff_u4k.py"]

model = dict(
    config=dict(
        patch_process_shape=[448, 448],
        patch_raw_shape=[540, 960],
        coarse_branch=dict(
            _delete_=True,
            type="DA2",
            model_cfg=dict(encoder="vitl", features=256,
                           out_channels=[256, 512, 1024, 1024]),
            pretrained=None,
        ),
        refiner=dict(
            fusion_model=dict(
                coarse_chl=[128, 256, 256, 256, 256, 256],
            ),
        ),
    ),
)

train_dataloader = dict(dataset=dict(transform_cfg=dict(network_process_size=[448, 448])))
val_dataloader = dict(dataset=dict(transform_cfg=dict(network_process_size=[448, 448])))
