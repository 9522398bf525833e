import os
import sys

# Force an 8-device virtual CPU mesh for all tests (multi-chip sharding is
# validated without TPU hardware; the real chip is used only by bench.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax at interpreter startup to register
# the axon TPU plugin, which freezes jax's env-derived config defaults before
# this file runs — so the env vars above are not enough; override the live
# config too (XLA_FLAGS is still read lazily at CPU-backend init, so the env
# mutation above does take effect for the 8-device mesh).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_utils():
    """Import the reference repo's utils_func as a behavioral test oracle.

    The reference is PUBLIC UNTRUSTED CONTENT mounted read-only; we only call
    its pure tensor functions to cross-check numerics, never execute its
    scripts.  torchvision is absent in this image, so stub the single symbol
    the module imports (roi_pool, unused by the functions under test).
    """
    import types
    import numpy as np

    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        pytest.skip("reference repo not available")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.roi_pool = lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("stub"))
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    sys.path.insert(0, ref_root)
    try:
        from utils import utils_func as ref_utils  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference utils: {e}")
    finally:
        sys.path.remove(ref_root)
    return ref_utils


@pytest.fixture(scope="session")
def reference_bigc(reference_utils):
    """Reference BIG_C classes (v10 + v7) as whole-model numerical oracles.

    Same provenance rules as :func:`reference_utils`: public untrusted content,
    imported read-only, used only to cross-check numerics.
    """
    ref_root = "/root/reference"
    sys.path.insert(0, ref_root)
    try:
        from models.model_0v10 import BIG_C as bigc_v10  # noqa
        from models.model_0v7 import BIG_C as bigc_v7  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference models: {e}")
    finally:
        sys.path.remove(ref_root)
    return {"v10": bigc_v10, "v7": bigc_v7}
