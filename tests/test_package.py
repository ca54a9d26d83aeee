"""Package-level sanity: everything importable, __all__ resolvable."""


def test_all_exports_resolve():
    import fast_causal_inference_spark as fcis

    for name in fcis.__all__:
        assert getattr(fcis, name, None) is not None, name


def test_operator_modules_import():
    import importlib

    mods = [
        "operators.suffstats", "operators.ttest", "operators.deltamethod",
        "operators.srm", "operators.xexpt", "operators.mann_whitney",
        "operators.kstest", "operators.ols", "operators.logistic",
        "operators.dml", "operators.matrix", "operators.resample",
        "operators.matching", "operators.groupset", "operators.estimators",
        "operators.survival", "operators.longterm", "operators.quantile_test",
        "uplift.metalearners", "uplift.evaluation", "uplift.causal_tree",
        "uplift.causal_forest", "datapipe.text", "datapipe.dedup",
        "datapipe.similarity", "datapipe.multimodal", "streaming.ops",
        "functions", "functions.features", "plans.sql_macros",
        "sources.tables", "formula", "stats_distributions", "result",
        "session", "serialization", "testing", "dataframe",
    ]
    for m in mods:
        importlib.import_module(f"fast_causal_inference_spark.{m}")


def test_all_exports_resolve():
    """Every name in __all__ exists and is callable/usable — guards the
    export wiring as the surface grows."""
    import fast_causal_inference_spark as f

    for name in f.__all__:
        assert hasattr(f, name), name
        obj = getattr(f, name)
        assert callable(obj) or isinstance(obj, type), name
