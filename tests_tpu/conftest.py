"""Real-hardware test tier (opt-in): run `python -m pytest tests_tpu -q`
ON the TPU host, with no other TPU process alive (the hosted tunnel
serializes; a second client hangs).

Unlike tests/ (which forces an 8-device virtual CPU platform), this tier
uses whatever accelerator `jax.devices()` reports and SKIPS everything
when that is not a TPU — so it is safe to invoke from any CI lane.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.devices()[0].platform != "tpu":
        skip = pytest.mark.skip(reason="no TPU attached")
        for item in items:
            item.add_marker(skip)
