"""Checkpoint conversion CLI (reference: convert_pth.py:1-17, generalized).

Modes:
* strip-module: rewrite a torch .pth removing the DDP 'module.' prefix
  (the reference tool's only job);
* to-flax: import a reference PSPNet or CWT-transformer .pth into this
  framework's orbax checkpoint format.

CLI:
  python -m few_shot_seg_cwt_tpu.utils.convert_ckpt strip-module in.pth out.pth
  python -m few_shot_seg_cwt_tpu.utils.convert_ckpt to-flax pspnet in.pth out.ckpt [--arch vgg]
  python -m few_shot_seg_cwt_tpu.utils.convert_ckpt to-flax cwt in.pth out.ckpt
"""

from __future__ import annotations

import argparse

from .ckpt import (
    import_cwt,
    import_pspnet,
    load_torch_checkpoint,
    save_ckpt,
    strip_module_prefix,
)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="checkpoint converter")
    sub = parser.add_subparsers(dest="mode", required=True)

    p1 = sub.add_parser("strip-module")
    p1.add_argument("src")
    p1.add_argument("dst")

    p2 = sub.add_parser("to-flax")
    p2.add_argument("kind", choices=["pspnet", "cwt"])
    p2.add_argument("src")
    p2.add_argument("dst")
    p2.add_argument("--arch", default="resnet", choices=["resnet", "vgg"])

    args = parser.parse_args(argv)
    if args.mode == "strip-module":
        import torch

        sd = load_torch_checkpoint(args.src)
        torch.save({"state_dict": strip_module_prefix(sd)}, args.dst)
        print(f"wrote {args.dst}")
        return

    sd = load_torch_checkpoint(args.src)
    tree = import_pspnet(sd, arch=args.arch) if args.kind == "pspnet" else import_cwt(sd)
    save_ckpt(args.dst, tree)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
