"""Regenerate tests/golden/flagship_triplets.json (see tests/golden_utils.py).

Run only after an intentional output-changing modification:
  JAX_PLATFORMS=cpu python scripts/regen_golden.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from golden_utils import golden_outputs  # noqa: E402

path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden",
    "flagship_triplets.json")
os.makedirs(os.path.dirname(path), exist_ok=True)
with open(path, "w") as f:
    json.dump(golden_outputs(), f, indent=1, sort_keys=True)
print(f"wrote {path}")
