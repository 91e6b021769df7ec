"""CLI: one-time weight conversion torch/safetensors -> orbax.

Replaces the reference's install-time weight downloads + torch loading
(install_videovanish.sh:68-70, diffuerase.py:41-44) with an explicit
porting step:

    python -m videovanish_tpu.cli.convert \
        --input sd-vae-ft-mse/diffusion_pytorch_model.safetensors \
        --model vae --output checkpoints/sd_vae_ft_mse.orbax

After converting the pieces, `--assemble diffueraser` bundles them into
the single tree DiffuEraserConfig.checkpoint loads, deriving the real
null-prompt embedding from the converted CLIP text encoder:

    python -m videovanish_tpu.cli.convert --assemble diffueraser \
        --vae ckpt/vae.orbax --unet ckpt/unet.orbax \
        --brushnet ckpt/brushnet.orbax --clip ckpt/clip_text.orbax \
        --output checkpoints/diffueraser.orbax
"""
from __future__ import annotations

import argparse


def _rules():
    from videovanish_tpu.core.convert import (
        FLOWCOMP_RULES, PROPAINTER_RULES, RAFT_RULES, SAM2_RULES,
        SAM2_SPECIALS, UNET_RULES, UNET_SPECIALS, VAE_RULES,
    )
    from videovanish_tpu.models.diffueraser.text_encoder import (
        CLIP_RULES, CLIP_SPECIAL,
    )
    # model name -> (rename rules, layout-override specials)
    return {
        "vae": (VAE_RULES, ()),
        "unet": (UNET_RULES, UNET_SPECIALS),
        "brushnet": (UNET_RULES, UNET_SPECIALS),
        "sam2": (SAM2_RULES, SAM2_SPECIALS),
        "clip": (CLIP_RULES, CLIP_SPECIAL),
        # ProPainter's three weight files (reference diffuerase.py:49)
        "raft": (RAFT_RULES, ()),
        "flow_completion": (FLOWCOMP_RULES, ()),
        "propainter": (PROPAINTER_RULES, ()),
        "raw": ([], ()),
    }


def assemble_diffueraser(vae_path, unet_path, brushnet_path, clip_path,
                         out_path=None, clip_heads=None):
    """Bundle converted pieces into DiffuEraserConfig.checkpoint's tree:
    {vae, unet, brushnet, null_text_emb}. The null-prompt embedding is
    the converted CLIP encoder applied to the empty prompt — the exact
    conditioning of the reference's guidance-0 path (diffuerase.py:61),
    replacing the random placeholder used before weights exist."""
    from videovanish_tpu.core.checkpoint import load_pytree, save_pytree
    from videovanish_tpu.models.diffueraser.text_encoder import (
        derive_null_text_emb,
    )

    clip = load_pytree(clip_path)
    emb_tbl = clip["token_embedding"]["embedding"]
    n_layers = sum(1 for k in clip if k.startswith("layers_"))
    width = int(emb_tbl.shape[1])
    null_emb = derive_null_text_emb(
        clip, width=width, layers=n_layers,
        # CLIP's head dim is 64 across published sizes (ViT-L text: 12
        # heads x 64 = 768); overridable for tiny test configs
        num_heads=clip_heads or max(1, width // 64),
        vocab_size=int(emb_tbl.shape[0]),
        max_positions=int(clip["position_embedding"].shape[0]))
    tree = {
        "vae": load_pytree(vae_path),
        "unet": load_pytree(unet_path),
        "brushnet": load_pytree(brushnet_path),
        "null_text_emb": null_emb,
    }
    if out_path:
        save_pytree(out_path, tree)
    return tree


def main(argv=None) -> None:
    # Weight conversion is pure host work: never initialize the TPU
    # backend (a down/degraded tunnel would hang the whole conversion).
    # VV_PLATFORM still overrides for exotic setups.
    import os

    from videovanish_tpu.core.runtime import apply_env_platform
    os.environ.setdefault("VV_PLATFORM", "cpu")
    apply_env_platform()

    rules_by_model = _rules()
    ap = argparse.ArgumentParser(
        description="Convert a torch/safetensors checkpoint to an orbax "
                    "pytree for videovanish_tpu.")
    ap.add_argument("--input", help=".pt/.pth/.safetensors checkpoint path")
    ap.add_argument("--model", choices=sorted(rules_by_model),
                    help="which rule set to apply")
    ap.add_argument("--output", required=True, help="orbax output directory")
    ap.add_argument("--dry_run", action="store_true",
                    help="print the converted tree structure, do not save")
    ap.add_argument("--lora", action="append", default=[],
                    help="LoRA checkpoint(s) to fold into --input before "
                         "conversion (peft/diffusers or kohya layout; the "
                         "reference's '2-Step' ckpt is a PCM LoRA on the "
                         "SD1.5 UNet). Repeatable; applied in order.")
    ap.add_argument("--lora_scale", type=float, default=1.0,
                    help="multiplier on every merged LoRA delta")
    ap.add_argument("--assemble", choices=["diffueraser"],
                    help="bundle already-converted orbax pieces instead of "
                         "converting a torch file")
    ap.add_argument("--vae", help="[assemble] converted VAE orbax dir")
    ap.add_argument("--unet", help="[assemble] converted UNet orbax dir")
    ap.add_argument("--brushnet", help="[assemble] converted BrushNet dir")
    ap.add_argument("--clip", help="[assemble] converted CLIP text dir")
    args = ap.parse_args(argv)

    if args.assemble:
        for f in ("vae", "unet", "brushnet", "clip"):
            if not getattr(args, f):
                ap.error(f"--assemble requires --{f}")
        tree = assemble_diffueraser(args.vae, args.unet, args.brushnet,
                                    args.clip,
                                    None if args.dry_run else args.output)
    else:
        if not args.input or not args.model:
            ap.error("--input and --model are required unless --assemble")
        from videovanish_tpu.core.convert import (
            convert_torch_file, sam2_fb_preprocess,
        )
        rules, specials = rules_by_model[args.model]
        tree = convert_torch_file(
            args.input, rules,
            out_path=None if args.dry_run else args.output,
            special=specials,
            lora_paths=args.lora, lora_scale=args.lora_scale,
            # fb-format SAM2 stores 4 separate point embeddings that
            # merge into one table (regexes can't express the stack)
            preprocess=sam2_fb_preprocess if args.model == "sam2" else None)
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
