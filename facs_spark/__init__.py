"""facs_spark — PySpark-native distributed sketch / approximate-
aggregation engine (from-scratch re-imagining of SciLifeLab/facs).

Top-level surface:

* ``facs_spark.sketch`` — pure-numpy mergeable sketches (no Spark).
* ``facs_spark.api`` — the reference-compatible build/query/remove.
* ``facs_spark.session.get_spark`` — tuned local session.
* ``python -m facs_spark`` — CLI (build|query|remove|info).

Spark-dependent modules load lazily so the sketch core stays usable
without a JVM.
"""

from __future__ import annotations

__version__ = "0.1.0"

_LAZY = {
    "api": "facs_spark.api",
    "session": "facs_spark.session",
    "sketch": "facs_spark.sketch",
    "queries": "facs_spark.queries",
    "functions": "facs_spark.functions",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'facs_spark' has no attribute {name!r}")


__all__ = list(_LAZY) + ["__version__"]
