"""Make the repo root importable and pin the example backend.

Examples mirror the reference's CPU/f64 workloads; set EXAMPLES_TPU=1 to run
them on the default accelerator (f32) instead.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if not os.environ.get("EXAMPLES_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
