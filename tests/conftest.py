"""Test harness: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4: multi-chip sharding is validated on one machine via
``xla_force_host_platform_device_count`` (the driver separately dry-runs
the multi-chip path through __graft_entry__.dryrun_multichip).

Note: this environment registers a TPU PJRT plugin from sitecustomize and
programmatically sets ``jax_platforms``; a plain JAX_PLATFORMS env var is
not enough, so we update jax.config after import (before any backend
initialization).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
