"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding code paths are exercised on
`--xla_force_host_platform_device_count=8` as the reference-free equivalent of
pod-slice testing (SURVEY.md §4). The axon TPU plugin registers itself even
when JAX_PLATFORMS=cpu, so we also force the platform through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
# persistent compile cache: repeat suite runs skip LLVM codegen entirely
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
