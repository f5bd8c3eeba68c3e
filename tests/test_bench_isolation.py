"""bench.py subsystem isolation (VERDICT r3 weak #5).

Each bench subsystem runs in its own subprocess with a fresh backend
client, so one faulting section (e.g. a Pallas kernel wedging the tunneled
TPU backend) nulls only its own row.  Proven here with the test-only
selftest sections: the faulting one yields None while its sibling still
returns a result from the same parent-side machinery.
"""
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _spawn(name):
    sys.path.insert(0, str(REPO))
    try:
        import bench
    finally:
        sys.path.pop(0)
    # Children must not claim the real TPU: force the CPU platform before
    # the child's sitecustomize preloads jax.
    old = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        return bench._spawn_section(name)
    finally:
        if old is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old


def test_faulting_section_nulls_only_itself():
    assert _spawn("selftest_fault") is None
    ok = _spawn("selftest_ok")
    assert ok == {"ok": [1.0]}
