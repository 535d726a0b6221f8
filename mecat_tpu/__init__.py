"""mecat_tpu: a TPU-native long-read overlap / error-correction / mapping framework.

Built from scratch in JAX / Pallas / pjit with the capabilities of
xiaochuanle/MECAT (mecat2pw, mecat2cns, mecat2ref, extract_sequences, and the
correct+trim pipeline).  See SURVEY.md for the blueprint and provenance notes.
"""

__version__ = "0.1.0"


def _configure_compilation_cache():
    """Enable the persistent XLA compilation cache via the config API.

    Remote compiles on this system cost 30-200 s per program; the cache cuts
    warm CLI runs by minutes.  The env-var route (JAX_COMPILATION_CACHE_DIR)
    does NOT work here — the sandbox's sitecustomize imports jax before user
    code, so env vars set by entry points arrive too late; the config API
    applies regardless.  Opt out with MECAT_TPU_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("MECAT_TPU_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        cache_dir = (os.environ.get("MECAT_TPU_COMPILE_CACHE")
                     or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                     or os.path.join(os.path.expanduser("~"), ".cache",
                                     "mecat_tpu", "jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _configure_platform():
    """Honor MECAT_TPU_PLATFORM=cpu|tpu|axon via the jax config API.

    The JAX_PLATFORMS env var does NOT work on this sandbox: sitecustomize
    imports jax and latches the 'axon' backend before user code runs, so a
    CLI invoked with JAX_PLATFORMS=cpu still initialises the TPU tunnel
    (and hangs if the device server is down).  The config API applies after
    import, so this knob is the reliable way to run any CLI on the host
    CPU (e.g. MECAT_TPU_PLATFORM=cpu python -m mecat_tpu.cli.mecat2pw ...).
    """
    import os

    plat = os.environ.get("MECAT_TPU_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - best-effort
        pass


_configure_compilation_cache()
_configure_platform()
