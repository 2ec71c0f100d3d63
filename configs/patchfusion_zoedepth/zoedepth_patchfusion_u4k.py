# Reference-named alias of the PatchFusion u4k recipe (reference
# zoedepth_patchfusion_u4k.py; canonical copy: pf_u4k.py).
_base_ = ["./pf_u4k.py"]

# reference patchfusion_zoedepth/zoedepth_patchfusion_u4k.py: BN mode under DP (parallel/bn.py)
convert_syncbn = True
