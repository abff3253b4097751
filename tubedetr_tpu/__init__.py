"""tubedetr_tpu — TPU-native spatio-temporal video grounding framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of TubeDETR
(reference: /root/reference). See SURVEY.md for the capability spec.
"""

from tubedetr_tpu.config import TubeDETRConfig

__version__ = "0.1.0"
__all__ = ["TubeDETRConfig"]
