"""Model persistence with a pointer file (SURVEY.md §2.10 D7, §2.9 T7).

Reproduces the reference's save/load protocol — versioned model dirs plus
a ``latest_model.txt`` pointer (reference:
Deliverable_3/NEW_train_offset_3_10min.py:153-173) and the model-type tag
file (reference: Deliverable_4/stream_and_historical_model.py:96-151) —
with two fixes:

- the pointer is written atomically (tmp + rename), so a concurrent
  reader never sees a torn path;
- ``current()`` caches the loaded model and re-reads from disk only when
  the pointer content changes, replacing the reference's unconditional
  per-micro-batch ``load_model()`` (reference: :237), which added disk
  IO to every 1-second predictor trigger.
"""

from __future__ import annotations

import os

from pyspark.ml.regression import (
    GBTRegressionModel,
    LinearRegressionModel,
    RandomForestRegressionModel,
)

# Model-type tag -> loader class (the reference's SELECTED_MODEL.txt).
MODEL_CLASSES = {
    "LinearRegression": LinearRegressionModel,
    "RandomForestRegressor": RandomForestRegressionModel,
    "GBTRegressor": GBTRegressionModel,
}


class ModelStore:
    """Versioned model directory with an atomically-updated pointer."""

    POINTER = "latest_model.txt"

    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self._cached_pointer: str | None = None
        self._cached_model = None

    # -- paths -----------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, self.POINTER)

    def _read_pointer(self) -> str | None:
        try:
            with open(self._pointer_path()) as f:
                content = f.read().strip()
            return content or None
        except FileNotFoundError:
            return None

    # -- write side --------------------------------------------------------
    def save(self, model, model_type: str = "LinearRegression") -> str:
        """Persist ``model`` to a fresh versioned dir and repoint the
        pointer (atomic tmp+rename; readers never see a torn write)."""
        if model_type not in MODEL_CLASSES:
            raise ValueError(f"unknown model_type {model_type!r}")
        version = self._next_version()
        model_path = os.path.join(self.base_dir, f"model_{version:06d}")
        model.write().overwrite().save(model_path)
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{model_path}\n{model_type}")
        os.replace(tmp, self._pointer_path())
        return model_path

    def _next_version(self) -> int:
        existing = [
            int(d.split("_")[1])
            for d in os.listdir(self.base_dir)
            if d.startswith("model_") and d.split("_")[1].isdigit()
        ]
        return (max(existing) + 1) if existing else 1

    # -- read side ---------------------------------------------------------
    def load(self):
        """Load the currently-pointed model from disk (always re-reads)."""
        content = self._read_pointer()
        if content is None:
            return None
        lines = content.splitlines()
        model_path = lines[0]
        model_type = lines[1] if len(lines) > 1 else "LinearRegression"
        return MODEL_CLASSES[model_type].load(model_path)

    def current(self):
        """The pointed model, cached: disk is touched only to re-read the
        tiny pointer file; the model itself reloads only on change."""
        content = self._read_pointer()
        if content is None:
            return None
        if content != self._cached_pointer:
            self._cached_model = self.load()
            self._cached_pointer = content
        return self._cached_model
