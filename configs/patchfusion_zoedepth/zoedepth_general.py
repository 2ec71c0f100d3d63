# General-image inference fragment for PatchFusion-era ZoeDepth runs
# (reference patchfusion_zoedepth/zoedepth_general.py): combine with a
# model config on the CLI via tools/test.py --test-type general.
_base_ = ["../_base_/datasets/general_dataset.py"]

collect_input_args = ["image_lr", "depth_gt", "image_hr"]
