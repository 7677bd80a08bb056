"""Run any repo module on the CPU backend (bypassing the axon TPU pin).

sitecustomize pre-imports jax with JAX_PLATFORMS=axon; plain env prefixes
don't stick. This wrapper flips the platform in-process (exactly like
tests/conftest.py) before the target module imports anything device-touching.

    python scripts/run_cpu.py [-d N] <module> [args...]

-d N adds an N-device virtual CPU mesh (--xla_force_host_platform_device_count).
"""

from __future__ import annotations

import os
import runpy
import sys

sys.path.insert(0, "/root/repo")


def main():
    args = sys.argv[1:]
    n_dev = 0
    if args and args[0] == "-d":
        n_dev = int(args[1])
        args = args[2:]
    if n_dev:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
    module, rest = args[0], args[1:]
    sys.argv = [module] + rest
    runpy.run_module(module, run_name="__main__", alter_sys=True)


if __name__ == "__main__":
    main()
