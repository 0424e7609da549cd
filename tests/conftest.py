"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the driver's
dryrun does the same).

The sandbox's sitecustomize imports jax at interpreter startup with the
shell's JAX_PLATFORMS (a remote TPU tunnel) already captured, so writing
os.environ["JAX_PLATFORMS"] here is too late — jax.config.update is the
override that still works after import. XLA_FLAGS, by contrast, is read
lazily at first backend initialisation, so setting it here is in time.
"""

import os

# air-gapped sandbox: without this, the HF tokenizer load retries the hub
# with exponential backoff for ~3.5 minutes before falling back
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# the backend defaults matmuls to bf16-like precision (TPU semantics);
# parity tests against torch need full f32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")


def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.device_count()


_assert_cpu_mesh()
