"""Alias package: the implementation lives in the importable short-name
package ``fiude_tpu`` (dashes in the project title aren't importable).

``import forecasting_influenza_using_universal_differential_equations_tpu``
exposes the same subpackages (ops / models / train / data / parallel /
utils).
"""
import importlib as _importlib
import sys as _sys

import fiude_tpu as _impl

__version__ = _impl.__version__

for _name in ("ops", "models", "train", "data", "parallel", "utils"):
    _sys.modules[f"{__name__}.{_name}"] = _importlib.import_module(
        f"fiude_tpu.{_name}")
