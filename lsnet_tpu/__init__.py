"""lsnet-tpu: TPU-native location-sensitive dense prediction framework.

Detection / instance segmentation / pose estimation as anchor point +
landmark vectors with cross-IOU loss, rebuilt from scratch on
JAX / XLA / Pallas / pjit.  See README.md for the feature surface.
"""

__version__ = "0.1.0"

from .utils.config import Config, ConfigDict  # noqa: F401
from .utils.registry import Registry, build_from_cfg  # noqa: F401


def __getattr__(name):
    # lazy heavyweight imports (jax/flax) so `import lsnet_tpu` stays cheap
    if name in ("init_detector", "inference_detector", "aug_test",
                "aug_test_simple", "show_result", "train_detector",
                "evaluate_detector"):
        from . import apis
        return getattr(apis, name)
    if name == "models":
        from . import models
        return models
    raise AttributeError(name)
