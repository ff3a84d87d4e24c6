"""stofnet_tpu — TPU-native sub-sample time-of-flight estimation framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
hahnec/stofnet (ICASSP 2024, arXiv:2308.12009): 1-D super-resolution
networks that localize ultrasound echoes to sub-sample precision, plus the
full surrounding stack — signal ops (Hilbert envelope, NMS peak decoding,
DAS beamforming, SVD clutter filtering), a baseline model zoo, datasets,
a train/eval driver, and sharded multi-device execution over TPU meshes.

Layout:
    ops/       pure-function signal kernels (jnp + Pallas)
    models/    flax.linen model zoo + registry + .pth importers
    data/      datasets, transforms, host->device pipelines
    train/     loss, metrics, train/eval steps, checkpointing
    parallel/  mesh construction, shardings, length-sharded (CP) conv
    cli/       config system + train/evaluate entry point + sweeps
    utils/     config, logging, misc
"""

__version__ = "0.3.0"
