"""genie_ray — Ray-Data-native closed information extraction / KG construction.

Public surface (lazily imported so ``import genie_ray`` stays light):

* ``World``, ``Catalog`` — the constrained world (catalogs + tokenizer + tries)
* ``run_kg_pipeline``, ``KGConfig`` — the flagship resumable pipeline
* ``make_catalogs``, ``make_documents`` — deterministic fixtures
"""

__version__ = "0.1.0"

_LAZY = {
    "World": ("genie_ray.core.world", "World"),
    "Catalog": ("genie_ray.core.catalog", "Catalog"),
    "run_kg_pipeline": ("genie_ray.pipelines.kg", "run_kg_pipeline"),
    "KGConfig": ("genie_ray.pipelines.kg", "KGConfig"),
    "make_catalogs": ("genie_ray.fixtures", "make_catalogs"),
    "make_documents": ("genie_ray.fixtures", "make_documents"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
