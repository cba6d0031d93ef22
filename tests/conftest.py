"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's test plan item (e): multi-device semantics are
exercised hermetically via `--xla_force_host_platform_device_count=8`, so no
TPU hardware is needed for the suite. Pallas kernels run in interpreter mode
on CPU (they select it automatically via `mst_tpu.ops.attention._on_tpu`).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-register a hardware TPU plugin at interpreter
# startup (sitecustomize) and pin jax_platforms; the config update below
# out-pins it so the suite always runs on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
