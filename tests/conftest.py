"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-imports jax via sitecustomize, so env vars like
JAX_PLATFORMS are too late — we use the config API, which still works because
the backend initializes lazily on first use.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
