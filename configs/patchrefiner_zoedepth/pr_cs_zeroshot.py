# Zero-shot Cityscapes evaluation of the u4k-trained V1 model
# (reference pr_cs_zeroshot.py): u4k depth range + u4k coarse checkpoint.
_base_ = ["./pr_cs.py"]

max_depth = 80

model = dict(
    config=dict(
        image_raw_shape=[2160, 3840],
        max_depth=max_depth,
        pretrain_coarse_model="./work_dir/zoedepth/u4k/coarse_pretrain/checkpoint_24",
        pretrain_fine_model=None,
    ),
)

# reference patchrefiner_zoedepth/pr_cs_zeroshot.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
