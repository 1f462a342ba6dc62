"""Export a trained generator to a serialized StableHLO inference artifact.

Thin launcher for `terra_gan_tpu.serving.export:main` (also installed
as the `terra-gan-tpu-export` console script).

Usage:
  python scripts/export_model.py --checkpoint models/master_model.pth \
      --out generator.shlo \
      [--quant w8a8 --calib-dir <dir with tile/mask pngs>] \
      [--platforms tpu,cpu] [--size 512] [--fp32] [--static-batch N] \
      [--backend cpu]

Serve it:  python -m terra_gan_tpu.serving.server --exported generator.shlo
Load it:   terra_gan_tpu.serving.export.load_exported("generator.shlo")
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from terra_gan_tpu.serving.export import main

if __name__ == "__main__":
    raise SystemExit(main())
