"""Test configuration: force an 8-virtual-device CPU platform.

The ambient environment preloads JAX via sitecustomize with
JAX_PLATFORMS=axon (the real TPU tunnel); unit tests must never claim that
chip, so the platform is overridden through jax.config (env edits are too
late — jax is already imported).  Multi-chip sharding logic (parallel/) is
exercised on the virtual CPU mesh; bench.py targets the real TPU instead.
"""
import os
import pathlib

# XLA_FLAGS is read when the CPU client is created — still ahead of us.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated pytest runs skip recompiles.
# APTD_TEST_CACHE_DIR overrides (e.g. a throwaway dir when another local
# process shares .jax_cache — concurrent cache writes have aborted the
# interpreter in this container).
import os as _os
_CACHE = _os.environ.get(
    "APTD_TEST_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _CACHE)
# READ-mostly: serializing some train-step executables to the cache
# segfaults the interpreter under full-suite memory pressure (r4,
# reproduced 3x: put_executable_and_time -> SIGSEGV in zstandard/pickle;
# the same test passes standalone).  A huge write threshold keeps cache
# READS (warm compiles stay fast) while never exercising the crashing
# write path from pytest.  Set APTD_TEST_CACHE_WRITE=1 to warm the cache
# in a dedicated run.
import os as _os2
_wr = 0.5 if _os2.environ.get("APTD_TEST_CACHE_WRITE") else 1e9
jax.config.update("jax_persistent_cache_min_compile_time_secs", _wr)

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 8


@pytest.fixture(scope="session")
def cornell_scene():
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    return load_scene(str(REPO / "scenes" / "cornell_box.txt"))


@pytest.fixture(scope="session")
def cornell_scene_small():
    """Cornell box at 64x64 for fast render tests."""
    import dataclasses

    import numpy as np

    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene(str(REPO / "scenes" / "cornell_box.txt"))
    cam = derive_camera((64, 64), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    return dataclasses.replace(scene, camera=cam, iterations=8)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Drop compiled-executable references between test modules.

    The full suite accumulates every jitted executable it ever built;
    under that memory pressure XLA:CPU's compiler segfaulted twice in a
    row (r5) while compiling test_scene_corpus's blob render — the same
    test passes standalone.  Releasing executables at module boundaries
    keeps peak RSS bounded; warm recompiles still hit the persistent
    cache on disk.
    """
    yield
    import jax
    jax.clear_caches()
