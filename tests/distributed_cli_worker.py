"""Worker for the multi-host CLI e2e test: runs the REAL pipeline
driver (`--mode train --mesh 8`) inside one of two processes of a
process group, from its own workspace copy (identical data on every
host, as on a real pod).

argv: <workspace_dir>. Env: TERRA_GAN_TPU_COORDINATOR / _NUM_PROCESSES
/ _PROCESS_ID (read by the CLI itself via initialize_from_env).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["EXPERIMENT_MODE"] = "true"

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    os.chdir(sys.argv[1])
    mode = sys.argv[2] if len(sys.argv) > 2 else "train"
    from terra_gan_tpu.cli.main_pipeline import main as cli_main

    return cli_main(["--mode", mode, "--config", "config.yaml",
                     "--mesh", "8"])


if __name__ == "__main__":
    sys.exit(main())
