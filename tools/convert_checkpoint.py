#!/usr/bin/env python
"""Convert a PyTorch reference checkpoint to an orbax checkpoint.

Usage:
    python tools/convert_checkpoint.py INPUT.pth OUTPUT_DIR \
        --kind da2|dino_vit|beit_midas [--prefix depth_head.]

--kind beit_midas converts a MiDaS DPT_BEiT_L_384 state dict (the torch.hub
checkpoint the reference's ZoeDepth coarse branch downloads, midas.py:342-347);
use --prefix coarse_branch.core.core. when the weights are nested inside an
estimator checkpoint.
"""

import argparse

from patchrefinerv2_tpu.utils.checkpoint import save_checkpoint
from patchrefinerv2_tpu.utils.torch_convert import (
    convert_beit_midas,
    convert_da2,
    convert_dino_vit,
    load_torch_state_dict,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--kind", choices=["da2", "dino_vit", "beit_midas"], default="da2")
    p.add_argument("--prefix", default=None)
    args = p.parse_args()

    sd = load_torch_state_dict(args.input)
    if args.kind == "da2":
        params = convert_da2(sd)
    elif args.kind == "beit_midas":
        params = convert_beit_midas(sd, args.prefix or "")
    else:
        params = convert_dino_vit(sd, args.prefix or "pretrained.")
    save_checkpoint(args.output, {"params": params})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
