#!/usr/bin/env python
"""Convert a PyTorch reference checkpoint to an orbax checkpoint.

Usage:
    python tools/convert_checkpoint.py INPUT.pth OUTPUT_DIR \
        --kind da2|dino_vit|beit_midas|timm_mbnet|timm_convnext \
        [--prefix depth_head.] [--in-ch 4]

Kinds:
  da2          full Depth-Anything-V2 checkpoint (trunk + DPT head)
  dino_vit     DINOv2 trunk only
  beit_midas   MiDaS DPT_BEiT_L_384 state dict (the torch.hub checkpoint
               the reference's ZoeDepth coarse branch downloads,
               midas.py:342-347); use --prefix coarse_branch.core.core.
               when nested inside an estimator checkpoint
  timm_mbnet   timm tf_efficientnet_b5_ap / mobilenetv3_large_100 encoder
               (lightweight_refiner.py:260-262); --in-ch 4 zero-extends
               the stem for the coarse-condition input
               (patchrefinerplus.py:144-200)
  timm_convnext  timm convnext(v2)_large encoder (--v1 for layer-scale v1)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patchrefinerv2_tpu.utils.checkpoint import save_checkpoint
from patchrefinerv2_tpu.utils.torch_convert import (
    convert_beit_midas,
    convert_da2,
    convert_dino_vit,
    convert_patchfusion,
    convert_patchrefinerplus,
    convert_timm_convnext,
    convert_timm_mbnet,
    load_torch_state_dict,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument(
        "--kind",
        choices=["da2", "dino_vit", "beit_midas", "timm_mbnet", "timm_convnext",
                 "estimator", "patchfusion"],
        default="da2",
    )
    p.add_argument("--prefix", default=None)
    p.add_argument("--in-ch", type=int, default=3, choices=[3, 4])
    p.add_argument("--v1", action="store_true", help="convnext v1 (layer scale)")
    args = p.parse_args()

    sd = load_torch_state_dict(args.input)
    if args.kind == "da2":
        tree = {"params": convert_da2(sd)}
    elif args.kind == "beit_midas":
        tree = {"params": convert_beit_midas(sd, args.prefix or "")}
    elif args.kind == "timm_mbnet":
        tree = convert_timm_mbnet(sd, args.prefix or "", in_ch=args.in_ch)
    elif args.kind == "timm_convnext":
        tree = convert_timm_convnext(
            sd, args.prefix or "", in_ch=args.in_ch, v2=not args.v1
        )
    elif args.kind == "estimator":
        # full PatchRefinerPlus save dict (coarse_branch ZoeDepth + bins
        # head, refiner_fine_branch timm encoder, refiner_fusion_model)
        tree = convert_patchrefinerplus(sd)
    elif args.kind == "patchfusion":
        tree = convert_patchfusion(sd)
    else:
        tree = {"params": convert_dino_vit(sd, args.prefix or "pretrained.")}
    save_checkpoint(args.output, tree)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
