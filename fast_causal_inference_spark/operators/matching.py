"""Placeholder — implemented later this round."""

def caliper_matching(*a, **k):
    raise NotImplementedError


def exact_matching(*a, **k):
    raise NotImplementedError


def smd(*a, **k):
    raise NotImplementedError
