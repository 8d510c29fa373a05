"""Model catalog — the gds.beta.model.* surface (list / exists / drop plus
store/load persistence).

Reference: ModelCatalogProc family (proc/catalog/.../ModelListProc.java,
ModelExistsProc.java, ModelDropProc.java): models are named, typed entries
(GraphSage is the one trainable model in scope, SURVEY §2.6) owned by the
session.  Persistence uses NumPy's npz container for the weight arrays plus
a JSON sidecar of the config — the Ray-native analogue of the reference's
stored-model directory (model storage is enterprise-gated there; the open
surface is the in-memory catalog, which this matches).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


class ModelCatalog:
    """Named model registry; one per application (the reference's is a
    per-DBMS singleton — here instantiate where needed)."""

    def __init__(self, base_dir: Optional[str] = None):
        self._models: dict = {}
        self._meta: dict = {}
        self.base_dir = base_dir
        if base_dir:
            os.makedirs(base_dir, exist_ok=True)

    def store(self, name: str, model, *, model_type: str = "graphSage",
              overwrite: bool = False) -> dict:
        if name in self._models and not overwrite:
            raise ValueError(f"Model {name!r} already exists")
        self._models[name] = model
        self._meta[name] = {"modelName": name, "modelType": model_type}
        return dict(self._meta[name])

    def get(self, name: str):
        if name not in self._models:
            raise KeyError(f"No model named {name!r}")
        return self._models[name]

    def exists(self, name: str) -> bool:
        return name in self._models

    def list(self) -> list:
        return [dict(self._meta[k]) for k in sorted(self._models)]

    def drop(self, name: str) -> bool:
        self._meta.pop(name, None)
        return self._models.pop(name, None) is not None

    # -- persistence (GraphSage) ------------------------------------------
    def save(self, name: str) -> str:
        if not self.base_dir:
            raise ValueError("catalog has no base_dir")
        model = self.get(name)
        d = os.path.join(self.base_dir, name)
        os.makedirs(d, exist_ok=True)
        arrays = {f"w{i}": np.asarray(w) for i, w in enumerate(model.weights)}
        np.savez(os.path.join(d, "weights.npz"), **arrays)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump({"activation": model.activation,
                       "sample_sizes": list(model.sample_sizes),
                       "seed": model.seed,
                       "n_layers": len(model.weights),
                       **self._meta[name]}, f)
        return d

    def load(self, name: str):
        from ..pipelines.graphsage import GraphSageModel
        if self.base_dir is None:
            raise ValueError("catalog has no base_dir")  # same guard as save
        d = os.path.join(self.base_dir, name)
        with open(os.path.join(d, "config.json")) as f:
            cfg = json.load(f)
        npz = np.load(os.path.join(d, "weights.npz"))
        weights = [npz[f"w{i}"] for i in range(cfg["n_layers"])]
        model = GraphSageModel(weights=weights, activation=cfg["activation"],
                               sample_sizes=tuple(cfg["sample_sizes"]),
                               seed=cfg["seed"])
        self._models[name] = model
        self._meta[name] = {"modelName": cfg["modelName"],
                            "modelType": cfg["modelType"]}
        return model
