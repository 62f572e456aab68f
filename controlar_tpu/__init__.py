"""ControlAR-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for controllable
autoregressive image generation, with the capabilities of hustvl/ControlAR.

Reference behavior contract: /root/reference (hustvl/ControlAR @ 2025-08-01).
This is a ground-up TPU-first re-design, not a port: functional pytree models,
jitted+sharded train/decode step functions, Pallas kernels on the hot path.
"""

__version__ = "0.1.0"
