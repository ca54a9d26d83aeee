"""Rich result objects mirroring the reference's ``testResult`` API.

The reference parses engine strings into objects exposing ``.estimate``,
``.stderr``, ``.t_statistic``, ``.p_value``, ``.confidence_interval`` …
(``dataframe/format.py:131-228``). Here results are born structured (rows of
a DataFrame), so this is a thin attribute view + pretty printer over a row.
"""

from __future__ import annotations

from collections.abc import Mapping


class TestResult(Mapping):
    """Attribute + mapping access over one statistical-result row."""

    _ALIASES = {
        "t_statistic": "t_stat",
        "pvalue": "p_value",
        "std_error": "stderr",
        # reference column spellings (dataframe/format.py parses these)
        "t-statistic": "t_stat",
        "p-value": "p_value",
        "statistic": "t_stat",
    }

    @property
    def conf_int(self):
        """Reference ``testResult.conf_int`` (format.py:178-186)."""
        return self.confidence_interval

    def __init__(self, data: dict):
        self._data = dict(data)

    # mapping protocol ---------------------------------------------------
    def __getitem__(self, k):
        # aliases apply only when the literal key is ABSENT: a result
        # that genuinely stores 'statistic'/'pvalue' (anova, contingency)
        # must stay readable and iterable under its own keys
        if k in self._data:
            return self._data[k]
        return self._data[self._ALIASES.get(k, k)]

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def __getattr__(self, k):
        d = object.__getattribute__(self, "_data")
        key = k if k in d else self._ALIASES.get(k, k)
        try:
            return d[key]
        except KeyError as e:
            raise AttributeError(k) from e

    @property
    def confidence_interval(self) -> tuple:
        return (self._data.get("lower"), self._data.get("upper"))

    def __repr__(self):
        parts = []
        for k, v in self._data.items():
            if isinstance(v, float):
                parts.append(f"{k}={v:.6g}")
            else:
                parts.append(f"{k}={v}")
        return "TestResult(" + ", ".join(parts) + ")"

    def summary(self) -> str:
        w = max(len(str(k)) for k in self._data) + 2
        lines = [f"{k:>{w}}  {v:.6g}" if isinstance(v, float)
                 else f"{k:>{w}}  {v}" for k, v in self._data.items()]
        return "\n".join(lines)


def test_result(df_or_row) -> "TestResult | list[TestResult]":
    """Wrap a 1-row (or n-row) statistical result DataFrame/Row."""
    from pyspark.sql import DataFrame, Row

    if isinstance(df_or_row, DataFrame):
        rows = df_or_row.collect()
        out = [TestResult(r.asDict()) for r in rows]
        return out[0] if len(out) == 1 else out
    if isinstance(df_or_row, Row):
        return TestResult(df_or_row.asDict())
    if hasattr(df_or_row, "to_dict"):        # pandas row / DataFrame
        d = df_or_row.to_dict()
        if d and isinstance(next(iter(d.values())), dict):  # pandas DataFrame
            recs = df_or_row.to_dict("records")
            out = [TestResult(r) for r in recs]
            return out[0] if len(out) == 1 else out
        return TestResult(d)
    raise TypeError(f"cannot wrap {type(df_or_row)}")
