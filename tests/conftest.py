"""Test config: force an 8-device virtual CPU mesh before JAX backends init.

This is the JAX analog of a fake multi-node backend (SURVEY.md section 4): all
sharding/collective paths are exercised on CPU with
``--xla_force_host_platform_device_count=8``.

Note: this environment pre-registers a TPU PJRT plugin at interpreter startup
(sitecustomize), which bakes ``jax_platforms`` from the env.  ``jax.config``
can still be updated before the first backend use, which is what we do here --
the env var alone is not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from uniir_tpu.core.mesh import make_mesh

    return make_mesh()


@pytest.fixture(scope="session")
def pipeline_root(tmp_path_factory):
    from tests.helpers import build_pipeline_tree

    root = tmp_path_factory.mktemp("uniir")
    build_pipeline_tree(str(root))
    return str(root)


@pytest.fixture(scope="session")
def bundle():
    from tests.helpers import tiny_clip_bundle

    return tiny_clip_bundle()
