"""TPU-native multi-task 3D ResEnc U-Net framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capability set of the
PyTorch reference ``bruniss/multi-task-3d-resencoder-unet``: config-driven
dynamic network construction, zarr patch datasets with valid-patch mining,
multi-task training with per-task losses, and Gaussian-weighted
sliding-window inference — plus a data-parallel pjit runtime the reference
never had.
"""

__version__ = "0.1.0"

from .core.config import ConfigManager
from .core.plan import NetworkPlan, TaskHead, plan_from_autoconfig, plan_from_manual_config
from .models.network import ResEncUNet, count_params
