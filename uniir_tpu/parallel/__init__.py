"""Multi-process / multi-host parallelism utilities.

Single-mesh sharding primitives live in `uniir_tpu.core.mesh`; this package
holds the process-level machinery: the `jax.distributed` smoke worker and
launcher used by the committed multi-host integration test
(tests/test_multihost.py), replacing the reference's torchrun entry
(src/models/uniir_clip/clip_scorefusion/train.py:306-331).
"""
