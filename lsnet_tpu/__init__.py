"""lsnet-tpu: TPU-native location-sensitive dense prediction framework.

Detection / instance segmentation / pose estimation as anchor point +
landmark vectors with cross-IOU loss, rebuilt from scratch on
JAX / XLA / Pallas / pjit.  See README.md for the feature surface.
"""

__version__ = "0.1.0"

import os as _os

# LSNET_PLATFORM=cpu|tpu|axon: force the JAX backend. Needed because some
# deployment images pin the platform via jax.config.update in
# sitecustomize, which silently overrides the JAX_PLATFORMS env var — the
# documented escape hatch is another config.update after import
# (.claude/skills/verify/SKILL.md gotchas; tests/conftest.py does the
# same for the virtual CPU mesh).
_plat = _os.environ.get("LSNET_PLATFORM", "")
if _plat:
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

from .utils.config import Config, ConfigDict  # noqa: F401
from .utils.registry import Registry, build_from_cfg  # noqa: F401


def enable_compile_cache(path: str = None) -> None:
    """Turn on XLA's persistent compilation cache (big models compile in
    minutes; repeated runs should not pay twice). Called automatically on
    first heavy import; set LSNET_TPU_CACHE=0 to disable or =<dir> to
    relocate."""
    env = _os.environ.get("LSNET_TPU_CACHE", "")
    if env == "0":
        return
    cache = path or env or "/tmp/jax_cache"
    try:
        import jax
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass  # cache is an optimization, never a hard failure


def __getattr__(name):
    # lazy heavyweight imports (jax/flax) so `import lsnet_tpu` stays cheap
    if name in ("init_detector", "inference_detector", "aug_test",
                "aug_test_simple", "show_result", "train_detector",
                "evaluate_detector"):
        enable_compile_cache()
        from . import apis
        return getattr(apis, name)
    if name == "models":
        enable_compile_cache()
        from . import models
        return models
    raise AttributeError(name)
