"""Test configuration: run JAX on an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §7 step 8 /
task contract: sharding is tested on a virtual 8-device CPU mesh).
"""
import os

# force-set: the sandbox presets JAX_PLATFORMS=axon (the real TPU); tests
# must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PYTEST_MECAT_CPU"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# XLA CPU compiles are ~20-60s/shape on this box; persist them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The env-var route is latched to 'axon' before we run; the config API wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
