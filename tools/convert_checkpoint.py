#!/usr/bin/env python
"""Convert a PyTorch reference checkpoint to an orbax checkpoint.

Usage:
    python tools/convert_checkpoint.py INPUT.pth OUTPUT_DIR \
        --kind da2|dino_vit [--prefix depth_head.]
"""

import argparse

from patchrefinerv2_tpu.utils.checkpoint import save_checkpoint
from patchrefinerv2_tpu.utils.torch_convert import (
    convert_da2,
    convert_dino_vit,
    load_torch_state_dict,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--kind", choices=["da2", "dino_vit"], default="da2")
    p.add_argument("--prefix", default=None)
    args = p.parse_args()

    sd = load_torch_state_dict(args.input)
    if args.kind == "da2":
        params = convert_da2(sd)
    else:
        params = convert_dino_vit(sd, args.prefix or "pretrained.")
    save_checkpoint(args.output, {"params": params})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
