"""Command-line entry points mirroring the reference CLI surface."""

import os


def enable_persistent_compile_cache(subdir: str = "jax_cli_cache") -> None:
    """Point jax at an on-disk compilation cache so repeated CLI invocations
    reuse executables instead of recompiling every shape (first compiles
    through the TPU relay take minutes; cached loads take seconds). Tests
    and bench.py set their own cache dirs; this covers the bare CLIs."""
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # respect an explicitly configured cache
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OT_COMPILE_CACHE", os.path.expanduser(f"~/.cache/{subdir}")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
