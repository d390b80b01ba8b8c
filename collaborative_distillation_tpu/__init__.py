"""Collaborative-Distillation, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of MingSun-Tse/Collaborative-Distillation
(CVPR'20): ultra-resolution universal style transfer via WCT over a VGG-19
encoder/decoder pyramid, plus the collaborative-distillation training pipeline
that produces the 16x-compressed student models.

Public surface:
    models   — declarative VGG autoencoder specs + apply functions + zoo
    ops      — NHWC conv/pool/upsample primitives, WCT transform math
    wct      — the 5-level stylization cascade engine
    parallel — device-mesh spatial tiling (halo exchange) and data parallelism
    train    — distillation losses, trainer, pruning initializer
    data     — image datasets / input pipelines
    utils    — logging, experiment dirs, checkpoint converters
"""

__version__ = "0.1.0"
