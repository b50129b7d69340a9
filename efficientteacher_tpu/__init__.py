"""efficientteacher_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
Efficient Teacher semi-supervised object-detection framework.

Capability-parity target: AlibabaResearch/efficientteacher (see SURVEY.md).
The compute path is JAX (Flax modules, XLA convs, Pallas kernels for NMS
and box geometry); data parallelism runs over a `jax.sharding.Mesh` with
psum gradient reduction instead of DDP.
"""

__version__ = "0.1.0"
