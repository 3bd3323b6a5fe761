"""String -> constructor registries.

The reference keeps one registry copy per phase package
(``sun_meta_training/models/models.py:4-26``, ``datasets/datasets.py:4-19``) and
performs CUDA placement inside ``make``. Here there is exactly one registry type,
no device placement (device layout is the mesh's job, see
``fewshot_vit_tpu.parallel``), and construction stays pure: ``make`` returns a
module/dataset object, never touching accelerator state.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable


class Registry:
    """A named string->constructor map with a decorator-style ``register``."""

    def __init__(self, kind: str):
        self.kind = kind
        self._ctors: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
        def deco(ctor: Callable[..., Any]) -> Callable[..., Any]:
            if name in self._ctors:
                raise KeyError(f"{self.kind} registry: duplicate name {name!r}")
            self._ctors[name] = ctor
            return ctor

        return deco

    def make(self, name: str, **kwargs: Any) -> Any:
        if name not in self._ctors:
            raise KeyError(
                f"{self.kind} registry: unknown name {name!r}; "
                f"known: {sorted(self._ctors)}"
            )
        return self._ctors[name](**kwargs)

    def __contains__(self, name: str) -> bool:
        return name in self._ctors

    def names(self) -> Iterable[str]:
        return sorted(self._ctors)

    def ctor(self, name: str) -> Callable[..., Any]:
        """The registered constructor (e.g. to inspect its defining module)."""
        return self._ctors[name]


# The two registries the framework uses, mirroring the reference's split
# (models.make / datasets.make) but shared across all phases.
models = Registry("model")
datasets = Registry("dataset")
