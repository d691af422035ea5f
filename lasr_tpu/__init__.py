"""lasr_tpu — TPU-native articulated shape-from-video framework.

A from-scratch jax/XLA/Pallas rebuild of the capabilities of google/lasr
(reference studied at /root/reference; see docs/DESIGN.md).
"""

__version__ = "0.1.0"
