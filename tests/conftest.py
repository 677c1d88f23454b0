"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding logic is
validated on an 8-device CPU mesh per the multi-host test strategy in
SURVEY.md section 4.

NOTE: this container's sitecustomize registers the tunneled 'axon' TPU
backend and calls jax.config.update("jax_platforms", "axon,cpu") at
interpreter start — which overrides the JAX_PLATFORMS *env var*. The
config must be re-updated here, before any backend initialization, to
actually get CPU.
"""

import os

# Persist XLA compiles; CPU compiles are slow in this environment.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
