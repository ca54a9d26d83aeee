"""Worker-side serialization hygiene.

Operators ship small Arrow finalizers to Python workers via
``mapInPandas``/pandas UDFs. In a cluster the package may not be installed on
executors (and the correctness driver hands us a session we didn't build), so
we register every loaded module of this package with cloudpickle's
pickle-by-value mode: closures then travel self-contained inside the task
binary instead of as import references. Idempotent and cheap — call
:func:`ensure_udf_serializable` before creating any Python UDF.
"""

from __future__ import annotations

import sys

_registered: set[str] = set()


def ensure_udf_serializable() -> None:
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover
        return
    if not hasattr(cloudpickle, "register_pickle_by_value"):  # pragma: no cover
        return
    pkg_prefix = __name__.split(".", 1)[0]
    for name, mod in list(sys.modules.items()):
        if mod is None or not name.startswith(pkg_prefix):
            continue
        if name in _registered:
            continue
        try:
            cloudpickle.register_pickle_by_value(mod)
            _registered.add(name)
        except Exception:  # pragma: no cover
            pass
