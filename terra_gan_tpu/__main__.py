"""`python -m terra_gan_tpu` == the pipeline driver CLI."""

import sys

from .cli.main_pipeline import main

if __name__ == "__main__":
    sys.exit(main())
