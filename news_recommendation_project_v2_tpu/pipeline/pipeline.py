"""Step-pipeline kernel with a content-keyed artifact cache.

Capability parity with the reference pipeline kernel (``pipeline.py:8-90``):
``PipelineComponent`` with ``transform``/``train`` + ``required_keys`` contracts,
and a ``Pipeline`` running named steps over (context, val_context) with per-step
caching. Fixes the reference's stale-cache quirk — its cache key is only
``{pipeline}_{step}`` (``pipeline.py:55-58``), so code or data changes silently
reuse stale artifacts; here the key chains (a) a cheap content fingerprint of
the ENTRY context (dataset identity, array shapes + sampled contents) with
(b) every component's declared configuration up to the current step, and
components can opt out entirely.
"""

from __future__ import annotations

import hashlib
import pickle
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Iterable, Optional

import numpy as np


def _digest_value(h: "hashlib._Hash", value: Any) -> None:
    """Stable FULL-content digest: any element change anywhere in an array,
    frame, or dict must change the fingerprint (a sampled digest silently
    served stale caches — review finding). Hashing is all C-speed bulk ops, so
    even a 65k x 1024 float table adds only ~0.1s once per pipeline run."""
    h.update(type(value).__name__.encode())
    if isinstance(value, (str, int, float, bool, bytes, Path)) or value is None:
        h.update(repr(value).encode())
    elif isinstance(value, np.ndarray):
        h.update(str((value.shape, value.dtype)).encode())
        if value.size:
            if value.dtype == object:
                h.update(repr(value.tolist()).encode())
            else:
                h.update(np.ascontiguousarray(value).tobytes())
    elif hasattr(value, "__dataclass_fields__"):
        for f in value.__dataclass_fields__:
            _digest_value(h, getattr(value, f))
    elif hasattr(value, "shape") and hasattr(value, "columns"):  # DataFrame
        import pandas as pd

        h.update(str((value.shape, list(value.columns))).encode())
        h.update(pd.util.hash_pandas_object(value, index=True).values.tobytes())
    elif isinstance(value, dict):
        h.update(str(len(value)).encode())
        for k in sorted(value, key=repr):
            h.update(repr(k).encode())
            _digest_value(h, value[k])
    else:
        h.update(repr(type(value)).encode())


def fingerprint_context(context: dict[str, Any]) -> str:
    h = hashlib.sha256()
    for key in sorted(context):
        h.update(key.encode())
        _digest_value(h, context[key])
    return h.hexdigest()[:16]


def check_req_keys(required_keys: set[str], context: dict[str, Any]) -> None:
    for key in required_keys:
        assert key in context, f"Required key {key!r} is not present in context"


class PipelineComponent(ABC):
    required_keys: set[str] = set()
    train_required_keys: set[str] = set()
    cacheable: bool = True

    @abstractmethod
    def transform(self, context: dict[str, Any]) -> dict[str, Any]:
        ...

    def train(
        self,
        context: dict[str, Any],
        val_context: Optional[dict[str, Any]] = None,
    ) -> None:
        pass

    def cache_token(self) -> str:
        """Configuration fingerprint mixed into the step cache key.

        The default is STABLE across processes: scalar/dataclass config fields
        hash by value; callables by qualified name; arrays/pytrees/other
        objects by type (their content is assumed derived from hashed config —
        e.g. seeded init or a warm-start Path). Components whose behavior
        depends on unhashed object content should override this.
        """
        parts = []
        for key, value in sorted(self.__dict__.items()):
            if isinstance(value, (str, int, float, bool, bytes, Path, tuple)) or (
                value is None or hasattr(value, "__dataclass_fields__")
            ):
                parts.append(f"{key}={value!r}")
            elif callable(value):
                parts.append(
                    f"{key}={getattr(value, '__qualname__', type(value).__name__)}"
                )
            else:
                parts.append(f"{key}=<{type(value).__name__}>")
        return "|".join(parts)


class Pipeline:
    """Sequential named steps over (context, val_context) with per-step cache
    (reference ``Pipeline``, ``pipeline.py:32-90``)."""

    def __init__(
        self,
        name: str,
        steps: Iterable[tuple[str, PipelineComponent]],
        use_cache: bool = True,
        cache_dir: Path = Path("cache"),
    ):
        self.name = name
        self._steps = list(steps)
        self.use_cache = use_cache
        self.cache_dir = Path(cache_dir)
        if use_cache:
            self.cache_dir.mkdir(parents=True, exist_ok=True)

    def _cache_path(
        self, step_name: str, component: PipelineComponent, chain: str
    ) -> Path:
        token = hashlib.sha256(
            f"{self.name}|{step_name}|{type(component).__name__}|"
            f"{component.cache_token()}|{chain}".encode()
        ).hexdigest()[:16]
        return self.cache_dir / f"{self.name}_{step_name}_{token}.pkl"

    def _iterate(
        self,
        context: dict[str, Any],
        val_context: Optional[dict[str, Any]],
        training: bool,
    ):
        # Chain key: entry-data fingerprint, folded with each step's config.
        # Skipped entirely when caching is off (token/fingerprint computation
        # is not free).
        chain = ""
        if self.use_cache:
            chain = fingerprint_context(context)
            if val_context is not None:
                chain += fingerprint_context(val_context)
        for step_name, component in self._steps:
            print(f"Starting step {step_name}")
            if self.use_cache:
                chain = hashlib.sha256(
                    f"{chain}|{type(component).__name__}|"
                    f"{component.cache_token()}".encode()
                ).hexdigest()[:16]
            cache_file = (
                self._cache_path(step_name, component, chain)
                if self.use_cache and component.cacheable
                else None
            )
            if cache_file is not None and cache_file.is_file():
                with open(cache_file, "rb") as f:
                    loaded = pickle.load(f)
                context = loaded["context"]
                val_context = loaded["val_context"]
            else:
                check_req_keys(component.required_keys, context)
                if training:
                    check_req_keys(component.train_required_keys, context)
                    component.train(context, val_context)
                context = component.transform(context)
                if val_context is not None:
                    val_context = component.transform(val_context)
                if cache_file is not None:
                    with open(cache_file, "wb") as f:
                        pickle.dump(
                            {"context": context, "val_context": val_context}, f
                        )
            print(f"Completed step {step_name}")
        return context, val_context

    def transform(self, context, val_context=None):
        return self._iterate(context, val_context, training=False)

    def train(self, context, val_context=None):
        return self._iterate(context, val_context, training=True)
