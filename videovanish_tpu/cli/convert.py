"""CLI: one-time weight conversion torch/safetensors -> orbax.

Replaces the reference's install-time weight downloads + torch loading
(install_videovanish.sh:68-70, diffuerase.py:41-44) with an explicit
porting step:

    python -m videovanish_tpu.cli.convert \
        --input sd-vae-ft-mse/diffusion_pytorch_model.safetensors \
        --model vae --output checkpoints/sd_vae_ft_mse.orbax
"""
from __future__ import annotations

import argparse

from videovanish_tpu.core.convert import (
    SAM2_RULES, SAM2_SPECIALS, UNET_RULES, UNET_SPECIALS, VAE_RULES,
    convert_torch_file,
)

# model name -> (rename rules, layout-override specials)
RULES = {
    "vae": (VAE_RULES, ()),
    "unet": (UNET_RULES, UNET_SPECIALS),
    "brushnet": (UNET_RULES, UNET_SPECIALS),
    "sam2": (SAM2_RULES, SAM2_SPECIALS),
    "propainter": ([], ()),
    "raw": ([], ()),
}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Convert a torch/safetensors checkpoint to an orbax "
                    "pytree for videovanish_tpu.")
    ap.add_argument("--input", required=True,
                    help=".pt/.pth/.safetensors checkpoint path")
    ap.add_argument("--model", required=True, choices=sorted(RULES),
                    help="which rule set to apply")
    ap.add_argument("--output", required=True, help="orbax output directory")
    ap.add_argument("--dry_run", action="store_true",
                    help="print the converted tree structure, do not save")
    args = ap.parse_args(argv)

    rules, specials = RULES[args.model]
    tree = convert_torch_file(args.input, rules,
                              out_path=None if args.dry_run else args.output,
                              special=specials)
    import jax
    leaves = jax.tree.leaves(tree)
    n_params = sum(int(x.size) for x in leaves)
    print(f"[convert] {len(leaves)} tensors, {n_params / 1e6:.1f}M params"
          + ("" if args.dry_run else f" -> {args.output}"))
    if args.dry_run:
        def walk(d, prefix=""):
            for k in sorted(d):
                v = d[k]
                if isinstance(v, dict):
                    walk(v, prefix + k + "/")
                else:
                    print(f"  {prefix}{k}: {tuple(v.shape)}")
        walk(tree)


if __name__ == "__main__":
    main()
