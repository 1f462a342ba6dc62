#!/usr/bin/env python3
"""One-time torchvision VGG16 IMAGENET1K_V1 -> .npz weight dump.

The reference's perceptual loss runs on torchvision VGG16
``features[:16]`` pretrained weights (mvp_gan/src/utils/losses.py:31).
This environment has no egress, so the pretrained tensors cannot be
downloaded here — run this script once on any machine with internet
access (torch + torchvision installed), then copy the .npz next to the
training config:

    python scripts/dump_vgg16_weights.py --out vgg16_features.npz
    # or, from an already-downloaded torchvision checkpoint:
    python scripts/dump_vgg16_weights.py --from-pth vgg16-397923af.pth --out vgg16_features.npz

The training pipeline picks the file up via
``terra_gan_tpu.models.vgg.load_weights`` (config key
``training.vgg_weights_path``); until then it falls back to fixed-seed
random features and tags the run accordingly.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="vgg16_features.npz")
    p.add_argument(
        "--from-pth",
        default=None,
        help="use a local torchvision vgg16 state-dict .pth instead of "
        "downloading (e.g. vgg16-397923af.pth)",
    )
    args = p.parse_args(argv)

    from terra_gan_tpu.models import vgg

    if args.from_pth:
        params = vgg.load_weights(args.from_pth)
    else:
        try:
            import torchvision.models as tvm

            weights = tvm.VGG16_Weights.IMAGENET1K_V1
            model = tvm.vgg16(weights=weights)
        except Exception as e:
            print(
                "ERROR: could not download IMAGENET1K_V1 weights "
                f"({e}).\nThis environment likely has no egress — run this "
                "script on a machine with internet access, or pass "
                "--from-pth <downloaded vgg16 .pth>.",
                file=sys.stderr,
            )
            return 2
        import numpy as np

        sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
        params = [
            (
                np.transpose(sd[f"features.{idx}.weight"], (2, 3, 1, 0)),
                sd[f"features.{idx}.bias"],
            )
            for idx in vgg._TORCH_CONV_IDX
        ]

    import numpy as np

    vgg.save_weights(args.out, params)
    total = sum(int(np.asarray(k).size + np.asarray(b).size) for k, b in params)
    print(f"wrote {args.out}: {len(params)} conv layers, {total:,} parameters")
    # round-trip sanity: loads back through the training-time loader
    loaded = vgg.load_weights(args.out)
    assert len(loaded) == len(params)
    print("round-trip load OK — point training.vgg_weights_path at this file")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
