"""Placeholder — implemented later this round."""

def ols(*a, **k):
    raise NotImplementedError


def wls(*a, **k):
    raise NotImplementedError


class OlsModel:  # noqa: D101
    pass


def did(*a, **k):
    raise NotImplementedError


def iv_regression(*a, **k):
    raise NotImplementedError
