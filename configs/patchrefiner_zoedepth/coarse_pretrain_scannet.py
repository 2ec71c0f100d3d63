# ZoeDepth coarse-branch pretraining on ScanNet++ (reference
# coarse_pretrain_scannet.py): indoor max_depth 10.
_base_ = [
    "../patchrefinerv2_zoedepth/coarse_pretrain_u4k.py",
    "../_base_/datasets/scannet.py",
]

min_depth = 1e-3
max_depth = 10

model = dict(
    min_depth=min_depth,
    max_depth=max_depth,
    image_raw_shape=[1440, 1920],
    coarse_branch=dict(min_depth=min_depth, max_depth=max_depth),
)

train_cfg = dict(max_epochs=5, save_checkpoint_interval=5)
param_scheduler = dict(div_factor=1, final_div_factor=10000, pct_start=0.5)

# reference patchrefiner_zoedepth/coarse_pretrain_scannet.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
