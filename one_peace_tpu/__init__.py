"""ONE-PEACE TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of OFA-Sys/ONE-PEACE.

The package is organised as:

- ``core``        config system, registries, RNG plumbing, metrics/logging
- ``models``      modality adapters + fusion transformer + task heads
- ``ops``         Pallas kernels and XLA compute primitives (attention, LN)
- ``parallel``    device mesh, sharding rules, collectives
- ``data``        tokenizer, datasets, iterators, collation
- ``tasks``       task registry (pretrain / retrieval / classify / grounding)
- ``criterions``  training objectives (ITC, DCL, classification, grounding)
- ``optim``       optax-based optimizers, LR schedules, layer decay
- ``metrics``     recall / accuracy / IoU / mAP evaluation reducers
- ``utils``       checkpoint conversion and misc helpers

All modules are pure-functional: parameters are pytrees (nested dicts of
jax arrays) and model objects carry only static configuration plus host-side
constant buffers (relative-position bucket tables), so every ``apply`` is
directly ``jax.jit``- and ``pjit``-compatible.
"""

__version__ = "0.1.0"
